package graft.olapsus

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dimension resolution + fact load — the join/null-policy/aggregate
  * stage of the two ETLs (SIM: dags/spark_script_sim.py:330-402; SINASC:
  * dags/spark_script_sinasc.py:196-274), Parquet warehouse instead of
  * JDBC.
  *
  * All dim joins are broadcast left joins (the reference disables
  * auto-broadcast and hints every dim, spark_dag.py:41 + sim.py:294-304;
  * we hint identically). The demografia/info-nascimento joins are band
  * joins (equality columns + age/weight range) — Catalyst extracts the
  * equi part as hash keys and evaluates the range residually, so they
  * stay broadcast-hash, not nested-loop.
  *
  * Null policies ported exactly — they differ per fact and decide which
  * rows land on the 'Ignorado' members (SURVEY.md §7 risks):
  *  - SINASC: flat fill 0 (municipios, demografia, info), −1 for
  *    chave_tempo; rows with unmatched birth date DROPPED
  *    (sinasc.py:251-259).
  *  - SIM: municipio keys → 0 only when the source code was present but
  *    unmatched; fill 0 for ocupacao/grupo-causa; then `na.drop` over
  *    ALL grain keys (sim.py:384-399).
  */
/** Test-only fault injection for the crash-replay specs: invoked between
  * a fact day write and its manifest log row — the exact crash point the
  * idempotent day write ([[Warehouse.overwriteDay]] /
  * [[Warehouse.appendUnit]]) must survive. A no-op in production. */
private[olapsus] object IngestFaults {
  /** (warehouse root, dataset) — root-scoped so a spec's injected fault
    * can never fire inside another suite's concurrently-running ingest. */
  @volatile var afterFactWrite: (String, String) => Unit = (_, _) => ()
  /** Fires between a backfill day-batch's `d#<unit>` manifest row and
    * its plain-day row — the window where the day is written and
    * unit-logged but invisible to the batch driver. */
  @volatile var afterUnitKeyLog: (String, String) => Unit = (_, _) => ()
}

object Pipeline {

  /** SINASC clean rows → factNascimentos grain. */
  def resolveSinasc(clean: DataFrame, wh: Warehouse): DataFrame = {
    val dimData = broadcast(wh.table("dimData"))
    val dimHorario = broadcast(wh.table("dimHorario")
      .withColumn("tempo_str", format_string("%02d:%02d:%02d", col("hora"), col("minutos"), col("segundos"))))
    val dimMun = broadcast(wh.table("dimMunicipio")
      .withColumn("cod_mun_6", floor(col("codigo_ibge") / 10).cast("int")))
    val dimDem = broadcast(wh.table("dimDemografia"))
    val dimInfo = broadcast(wh.table("dimInfoNascimento"))

    val munLookup = dimMun.select(col("cod_mun_6"), col("chave_municipio"))

    val joined = clean
      .join(dimData.select(col("data").as("data_nascimento"), col("chave_data")),
        Seq("data_nascimento"), "left")
      .join(dimHorario.select("tempo_str", "chave_tempo"),
        col("tempo_nascimento") === col("tempo_str"), "left").drop("tempo_str")
      .join(munLookup.withColumnRenamed("chave_municipio", "chave_municipio_nascimento"),
        col("cod_mun_nasc") === col("cod_mun_6"), "left").drop("cod_mun_6")
      .join(munLookup.withColumnRenamed("chave_municipio", "chave_municipio_residencia"),
        col("cod_mun_res") === col("cod_mun_6"), "left").drop("cod_mun_6")
      .join(dimDem.withColumnRenamed("sexo", "sexo_dim"),
        (lit("F") === col("sexo_dim")) &&
          (col("raca_mae_desc") === col("raca")) &&
          (col("estciv_mae_desc") === col("estado_civil")) &&
          (col("esc_mae_desc") === col("escolaridade")) &&
          // Null-tolerant age arm (sinasc.py:224-227): unknown mother age
          // matches the band with NULL bounds.
          ((col("idade_mae").isNotNull && col("idade_mae") >= col("idade_minima")) ||
            (col("idade_mae").isNull && col("idade_minima").isNull)) &&
          (col("idade_maxima").isNull || col("idade_mae") <= col("idade_maxima")),
        "left")
      .join(dimInfo.withColumnRenamed("sexo", "sexo_rn_dim"),
        (col("sexo_rn_desc") === col("sexo_rn_dim")) &&
          (col("raca_rn_desc") === col("raca_cor")) &&
          (col("parto_desc") === col("tipo_parto")) &&
          (col("gestacao_desc") === col("tempo_gestacao")) &&
          (col("gravidez_desc") === col("tipo_gravidez")) &&
          ((col("peso_gramas").isNotNull && col("peso_gramas") >= col("peso_min_gramas")) ||
            (col("peso_gramas").isNull && col("peso_min_gramas").isNull)) &&
          (col("peso_max_gramas").isNull || col("peso_gramas") <= col("peso_max_gramas")),
        "left")

    val keys = Seq("chave_data", "chave_tempo", "chave_municipio_nascimento",
      "chave_municipio_residencia", "chave_demografia", "chave_info_nascimento")

    joined
      .na.fill(Map(
        "chave_municipio_nascimento" -> 0,
        "chave_municipio_residencia" -> 0,
        "chave_demografia" -> 0,
        "chave_info_nascimento" -> 0,
        "chave_tempo" -> -1))
      .filter(col("chave_data").isNotNull)
      .groupBy(keys.map(col): _*)
      .count()
      .withColumnRenamed("count", "quantidade_nascimentos")
  }

  /** SIM clean rows (with chave_grupo_causa attached) → factObitos grain. */
  def resolveSim(withGroups: DataFrame, wh: Warehouse): DataFrame = {
    val dimData = broadcast(wh.table("dimData"))
    val dimHorario = broadcast(wh.table("dimHorario")
      .withColumn("tempo_str", format_string("%02d:%02d:%02d", col("hora"), col("minutos"), col("segundos"))))
    val dimMun = broadcast(wh.table("dimMunicipio")
      .withColumn("cod_mun_6", floor(col("codigo_ibge") / 10).cast("int")))
    val dimOcup = broadcast(wh.table("dimOcupacao"))
    val dimDem = broadcast(wh.table("dimDemografia"))

    val joined = withGroups
      .join(dimData.select(col("data").as("data_nascimento"), col("chave_data").as("chave_data_nascimento")),
        Seq("data_nascimento"), "left")
      .join(dimData.select(col("data").as("data_obito"), col("chave_data").as("chave_data_obito")),
        Seq("data_obito"), "left")
      .join(dimHorario.select("tempo_str", "chave_tempo"),
        col("tempo_obito") === col("tempo_str"), "left")
      .withColumnRenamed("chave_tempo", "chave_tempo_obito").drop("tempo_str")
      .join(dimMun.select(col("cod_mun_6").as("cod_mun_res"), col("chave_municipio").as("chave_municipio_residencia")),
        Seq("cod_mun_res"), "left")
      .join(dimMun.select(col("cod_mun_6").as("cod_mun_ocor"), col("chave_municipio").as("chave_municipio_obito")),
        Seq("cod_mun_ocor"), "left")
      .join(dimOcup.select(col("cbo_2002").as("ocupacao_cbo"), col("chave_ocupacao")),
        Seq("ocupacao_cbo"), "left")
      .join(dimDem,
        (col("sexo_desc") === col("descricao_sexo")) &&
          (col("raca_desc") === col("raca")) &&
          (col("estciv_desc") === col("estado_civil")) &&
          (col("esc_desc") === col("escolaridade")) &&
          // NOTE: unlike SINASC there is no null-age arm (sim.py:367) —
          // unknown age falls off every band and na.drop removes the row.
          (col("idade_anos") >= col("idade_minima")) &&
          (col("idade_maxima").isNull || col("idade_anos") <= col("idade_maxima")),
        "left")

    val keys = Seq("chave_data_nascimento", "chave_data_obito", "chave_tempo_obito",
      "chave_municipio_residencia", "chave_municipio_obito", "chave_demografia",
      "chave_grupo_causa", "chave_ocupacao")

    joined
      // Municipio → 0 only when a code was present but unmatched
      // (sim.py:384-394); absent codes stay NULL and the row drops.
      .withColumn("chave_municipio_residencia",
        when(col("chave_municipio_residencia").isNull && col("cod_mun_res").isNotNull, 0)
          .otherwise(col("chave_municipio_residencia")))
      .withColumn("chave_municipio_obito",
        when(col("chave_municipio_obito").isNull && col("cod_mun_ocor").isNotNull, 0)
          .otherwise(col("chave_municipio_obito")))
      .na.fill(0, Seq("chave_ocupacao", "chave_grupo_causa"))
      .groupBy(keys.map(col): _*)
      .count()
      .withColumnRenamed("count", "quantidade_obitos")
      .na.drop(keys)
  }

  private def readRaw(wh: Warehouse, paths: Seq[String]): DataFrame =
    wh.spark.read
      .option("header", "true").option("sep", ";").option("inferSchema", "false")
      .csv(paths: _*)

  /** Full SINASC ingest of one `dt=` batch of raw CSVs (header, `;`,
    * no inference — sinasc.py:192). Paths may be globs or concrete
    * files in any configured FileSystem scheme (see [[Landing]]). */
  def ingestSinasc(wh: Warehouse, csvGlob: String, dt: String): Long =
    ingestSinascFiles(wh, Seq(csvGlob), dt)

  def ingestSinascFiles(wh: Warehouse, paths: Seq[String], dt: String): Long = {
    if (paths.isEmpty) return 0L
    // Lease first, manifest check inside it: the manifest-then-append
    // sequence is the exact read-before-write window a second concurrent
    // ingest corrupts (double-appended day). A crashed run's lease
    // expires and the replay converges through the manifest.
    graft.WriterLease.withLease(wh.spark, wh.root,
      graft.WriterLease.processOwner("ingest-sinasc"), scope = "sinasc") {
      if (wh.ingestLogged("sinasc", dt)) 0L
      else {
        val raw = readRaw(wh, paths)
        if (raw.isEmpty) 0L
        else {
          val fact = resolveSinasc(Transforms.sinasc(raw), wh)
          // overwriteDay, not append: a crash between this write and the
          // logIngest row below leaves the day written-but-unlogged, and
          // the replay must REPLACE it, not double it (see the
          // crash-replay contract on Warehouse.overwriteDay; forged in
          // CrashReplaySpec).
          wh.overwriteDay("factNascimentos", fact, dt)
          IngestFaults.afterFactWrite(wh.root, "sinasc")
          wh.logIngest("sinasc", dt)
          fact.count()
        }
      }
    }
  }

  /** Backfill every pending `dt=` day partition under the landing
    * prefix, oldest first — the engine-side equivalent of the
    * reference's daily Airflow loop (dags/spark_dag.py:48-78), driven
    * by the landing listing plus the ingest manifest: days already
    * logged are skipped (ingest*Files is idempotent), so re-running
    * backfill after a crash or on a schedule is safe. Returns
    * (dt, rows) per day processed. */
  def backfill(wh: Warehouse, prefix: String, dataset: String): Seq[(String, Long)] = {
    val days = Landing.listGlob(wh.spark, s"$prefix/$dataset/dt=*")
      .map(p => p.substring(p.lastIndexOf("dt=") + 3).stripSuffix("/"))
      .distinct.sorted
    days.map { dt =>
      val files = Landing.listDay(wh.spark, prefix, dataset, dt)
      val n = dataset match {
        case "sim" => ingestSimFiles(wh, files, dt)
        case "sinasc" => ingestSinascFiles(wh, files, dt)
        case other => sys.error(s"unknown dataset $other (sim|sinasc)")
      }
      dt -> n
    }
  }

  /** Full SIM ingest: transform → bridge merge (append new groups) →
    * resolve → append fact. */
  def ingestSim(wh: Warehouse, csvGlob: String, dt: String): Long =
    ingestSimFiles(wh, Seq(csvGlob), dt)

  def ingestSimFiles(wh: Warehouse, paths: Seq[String], dt: String): Long = {
    if (paths.isEmpty) return 0L
    // The bridge max+1 merge is the warehouse's most corruption-prone
    // single-writer contract (duplicate group ids are silent and
    // permanent) — lease before the manifest check, like the SINASC path.
    graft.WriterLease.withLease(wh.spark, wh.root,
      graft.WriterLease.processOwner("ingest-sim"), scope = "sim") {
      ingestSimLeased(wh, paths, dt)
    }
  }

  private def ingestSimLeased(wh: Warehouse, paths: Seq[String], dt: String): Long = {
    if (wh.ingestLogged("sim", dt)) return 0L
    val raw = readRaw(wh, paths)
    if (raw.isEmpty) return 0L
    val clean = Transforms.sim(raw.withColumn("row_id", monotonically_increasing_id()))
    // Incremental signature lookup: bootstrapped from the bridge once,
    // then maintained by appending each batch's new groups — the merge
    // never re-derives existing groups' signatures again.
    if (!wh.exists(Warehouse.Signatures))
      // Unleased variant: this caller already holds the `sim` scope
      // lease, which also guards the signature table.
      wh.writeUnleased(Warehouse.Signatures, CauseBridge.signatures(wh.table(Warehouse.Bridge)))
    val bridge = CauseBridge.resolve(clean, wh.table("dimCausa"),
      wh.table(Warehouse.Bridge), Some(wh.table(Warehouse.Signatures)))
    // Read-before-write single-writer merge (no ON CONFLICT in Parquet;
    // same assumption as the reference's max+1 id scheme, sim.py:214).
    // count() fully materializes the new rows into the cache BEFORE the
    // append below adds files to the directory the lazy plan reads.
    val newRows = bridge.newBridgeRows.cache()
    if (newRows.count() > 0) {
      wh.appendRows(Warehouse.Bridge, newRows)
      wh.appendRows(Warehouse.Signatures, bridge.newSignatureRows)
    }
    val fact = resolveSim(bridge.resolved, wh)
    // Crash-replayable day write — the bridge merge above is already
    // replay-idempotent (signature anti-join); this makes the fact
    // partition match it.
    wh.overwriteDay("factObitos", fact, dt)
    IngestFaults.afterFactWrite(wh.root, "sim")
    wh.logIngest("sim", dt)
    val n = fact.count()
    newRows.unpersist()
    n
  }
}
