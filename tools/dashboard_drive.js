// Headless drive of the dashboard's client-side script — the one layer
// ScalaTest cannot execute (DashboardSpec drives the HTTP routes; this
// drives the in-page JS). Loads the real HTML from a running DashServe,
// runs the real <script> under a minimal DOM shim, and checks the
// heatmap renders one column per PAYLOAD column even when the first
// row omits a null UF (DataFrame.toJSON drops null fields — the exact
// condition that once made Object.keys(rows[0]) lose columns), plus
// render sanity for the bars/donut tabs.
//
// Usage:
//   sbt "runMain graft.olapsus.Demo /tmp/demo"        # build a warehouse
//   java -cp target/scala-2.13/classes:/opt/spark/jars/* \
//     graft.olapsus.DashServe --warehouse /tmp/demo/warehouse --port 8055 &
//   node tools/dashboard_drive.js                      # expect DASHBOARD HEADLESS DRIVE OK
const BASE = process.env.DASH_BASE || 'http://localhost:8055';

function makeEl(tag) {
  return {
    tag, children: [], attrs: {}, textContent: undefined, value: '',
    onclick: null, onchange: null,
    classList: { toggle() {}, add() {}, remove() {} },
    appendChild(c) { this.children.push(c); return c; },
    removeChild(c) { this.children = this.children.filter(x => x !== c); return c; },
    get firstChild() { return this.children[0] || null; },
    setAttribute(k, v) { this.attrs[k] = String(v); },
    getAttribute(k) { return this.attrs[k]; },
  };
}

async function main() {
  const html = await (await fetch(BASE + '/')).text();
  const script = html.match(/<script>([\s\S]*)<\/script>/)[1];

  const byId = {};
  function getEl(id) {
    if (!byId[id]) {
      byId[id] = makeEl(id.startsWith('svg') ? 'svg' : 'div');
      // svg view-box sizes from the HTML
      const m = html.match(new RegExp(`id="${id}" width="(\\d+)" height="(\\d+)"`));
      if (m) { byId[id].attrs.width = m[1]; byId[id].attrs.height = m[2]; }
    }
    return byId[id];
  }
  const document = {
    getElementById: getEl,
    createElement: t => makeEl(t),
    createElementNS: (ns, t) => makeEl(t),
  };
  // start input defaults used by loadSlice (not driven here)
  getEl('start').value = '2020'; getEl('end').value = '2023';

  // the page uses relative URLs; node's fetch needs absolute ones
  const pageFetch = (p, ...rest) => fetch(p.startsWith('http') ? p : BASE + p, ...rest);
  // Return loadSlice out of the page-script scope: the slice tab is the
  // ONE chart the page renders only on a button click (startup calls
  // loadRollup2/loadPivot/loadDrill, and the familias fetch chains into
  // the donut), and the DOM shim never parses inline onclick handlers —
  // so the drive must invoke the handler itself to cover svg2.
  const fn = new Function('document', 'fetch',
    script + '\n;return typeof loadSlice === "function" ? loadSlice : null;');
  const loadSlice = fn(document, pageFetch);
  if (!loadSlice) throw new Error('loadSlice not found in page script');
  // Poll until the auto-loaded chart svgs have rendered children (all
  // startup api() fetches landed) instead of a fixed sleep: a cold
  // DashServe can take longer than any constant (flaky false failures),
  // and a warm one finishes in well under a second (wasted wall). Hard
  // timeout keeps a dead route from hanging the drive. svg2 (slice) is
  // NOT in this list — it renders only via the click path driven below.
  async function waitFor(ids) {
    const deadline = Date.now() + 30000;
    while (ids.some(id => getEl(id).children.length === 0)) {
      if (Date.now() > deadline) {
        const empty = ids.filter(id => getEl(id).children.length === 0);
        throw new Error('charts never rendered: ' + empty.join());
      }
      await new Promise(r => setTimeout(r, 100));
    }
  }
  await waitFor(['svg0', 'svg1', 'svg3', 'svg4']);

  // Drive the slice tab's click path with a real municipio (the drill
  // payload carries one); a city with no rows still renders the
  // 'Sem dados' message, so svg2 must get children either way.
  const drill = await (await fetch(BASE + '/api/drill')).json();
  const realCity = drill.rows[0] && drill.rows[0].municipio;
  getEl('city').value = realCity || 'no-such-city';
  loadSlice();
  await waitFor(['svg2']);
  const sliceDrewLine = getEl('svg2').children.some(c => c.tag === 'polyline');
  console.log(`slice city: ${getEl('city').value}; drew line chart: ${sliceDrewLine}`);
  // With a real municipio the slice MUST render the line chart — an
  // error payload or a renamed field also leaves a child in svg2 (the
  // msg() text), so children-nonempty alone would mask a regression.
  if (realCity && !sliceDrewLine) throw new Error('slice rendered no polyline for ' + realCity);

  const pivot = await (await fetch(BASE + '/api/pivot')).json();
  const wantCols = pivot.columns.filter(c => c !== 'ANO');
  const nullOmitted = pivot.rows.some(r => Object.keys(r).length < pivot.columns.length);

  const svg3 = getEl('svg3');
  // column headers are the texts at y = m.t - 6 = 34
  const headers = svg3.children.filter(c => c.tag === 'text' && c.attrs.y === '34');
  const cells = svg3.children.filter(c => c.tag === 'rect');
  console.log(`payload cols (minus ANO): ${wantCols.length}; rendered headers: ${headers.length}; ` +
    `rows: ${pivot.rows.length}; cells: ${cells.length}; first-row-omits-nulls: ${nullOmitted}`);
  if (headers.length !== wantCols.length) throw new Error('heatmap dropped columns');
  if (cells.length !== wantCols.length * pivot.rows.length) throw new Error('heatmap cell grid wrong');
  if (headers.map(h => h.textContent).join() !== wantCols.join()) throw new Error('header labels mismatch');

  const svg1 = getEl('svg1'); // rollup2 grouped bars
  if (!svg1.children.some(c => c.tag === 'rect')) throw new Error('rollup2 rendered no bars');
  const svg4 = getEl('svg4'); // drill-across bars
  if (!svg4.children.some(c => c.tag === 'rect')) throw new Error('drill rendered no bars');
  const svg0 = getEl('svg0'); // donut after familias load
  if (!svg0.children.some(c => c.tag === 'path')) throw new Error('donut rendered no arcs');
  console.log('DASHBOARD HEADLESS DRIVE OK');
}
main().catch(e => { console.error('FAIL:', e.message); process.exit(1); });
