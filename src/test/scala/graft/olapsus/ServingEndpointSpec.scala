package graft.olapsus

import graft.SparkSpecBase
import java.nio.file.Files
import java.sql.DriverManager

/** Integration test of the long-lived SQL endpoint: seeds + ingests a
  * warehouse, starts the Thrift server inside the session, and runs
  * roll-up #1 through a real JDBC client connection — the path a
  * dashboard takes against the reference (dashboard/app.py:29-32). */
class ServingEndpointSpec extends SparkSpecBase {

  private lazy val dir = Files.createTempDirectory("olapsus-serve")
  private lazy val wh: Warehouse = {
    val w = new Warehouse(spark, dir.resolve("wh").toString)
    Dims.seedAll(w,
      Fixtures.write(dir, "municipio.csv", Fixtures.municipio),
      Fixtures.write(dir, "cbo.csv", Fixtures.cbo),
      Fixtures.write(dir, "cid.csv", Fixtures.cid))
    Pipeline.ingestSim(w, Fixtures.write(dir, "sim.csv", Fixtures.sim), "2020-01-15")
    Pipeline.ingestSinasc(w, Fixtures.write(dir, "sinasc.csv", Fixtures.sinasc), "2020-01-15")
    w
  }

  // ONE server for the whole suite: HiveServer2's conf is static, so a
  // second startWithContext in the same JVM never binds its new port.
  private lazy val servingUrl: String = {
    val port = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    ServingEndpoint.start(wh, port)
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    s"jdbc:hive2://localhost:$port/default"
  }

  private def connectRetrying(url: String): java.sql.Connection =
    Iterator.range(0, 60).map { _ =>
      try Some(DriverManager.getConnection(url, "", ""))
      catch { case _: Exception => Thread.sleep(500); None }
    }.collectFirst { case Some(c) => c }
      .getOrElse(fail(s"endpoint at $url never became reachable"))

  private def fetchAll(rs: java.sql.ResultSet): List[List[String]] = {
    val n = rs.getMetaData.getColumnCount
    Iterator.continually(rs).takeWhile(_.next())
      .map(r => (1 to n).map(i => String.valueOf(r.getObject(i))).toList)
      .toList
  }

  test("firstRollUp is client-reachable over a JDBC connection") {
    // The server binds asynchronously; retry the connection briefly.
    val conn = connectRetrying(servingUrl)
    val rs = conn.createStatement().executeQuery(ServingQueries.firstRollUpSql)
    val viaJdbc = Iterator.continually(rs)
      .takeWhile(_.next())
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
      .toList
    conn.close()

    val direct = ServingQueries.firstRollUp(wh).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toList
    assert(viaJdbc == direct, "JDBC result differs from in-session result")
    assert(viaJdbc.nonEmpty)
  }

  test("4 concurrent JDBC clients × six serving queries: correct, non-interleaved results") {
    // The reference dashboard fires its callbacks in parallel
    // (dashboard/app.py:229-305); the endpoint must serve concurrent
    // clients the SAME rows a single-client run gets — no cross-talk, no
    // partial results. Six §2.8 shapes, each as the SQL a client sends.
    val queries: Seq[(String, String)] = Seq(
      "rollup1" -> ServingQueries.firstRollUpSql,
      "rollup2" -> """
        SELECT d_mun.estado, d_dem.faixa_etaria,
               SUM(f.quantidade_nascimentos) AS n
        FROM factnascimentos f
        JOIN dimmunicipio d_mun ON d_mun.chave_municipio = f.chave_municipio_nascimento
        JOIN dimdemografia d_dem ON d_dem.chave_demografia = f.chave_demografia
        GROUP BY 1, 2 ORDER BY 1, 2""",
      "slice" -> """
        SELECT d_dat.mes, d_dat.ano, SUM(f.quantidade_obitos) AS obitos
        FROM factobitos f
        JOIN dimdata d_dat ON d_dat.chave_data = f.chave_data_obito
        WHERE d_dat.ano BETWEEN 2019 AND 2021
        GROUP BY d_dat.mes, d_dat.ano, d_dat.numero_mes
        ORDER BY d_dat.ano, d_dat.numero_mes""",
      "pivotish" -> """
        SELECT d_dat.ano, d_mun.uf, SUM(f.quantidade_obitos) AS obitos
        FROM factobitos f
        JOIN dimdata d_dat ON d_dat.chave_data = f.chave_data_obito
        JOIN dimmunicipio d_mun ON d_mun.chave_municipio = f.chave_municipio_obito
        GROUP BY 1, 2 ORDER BY 1, 2""",
      "drillacross" -> """
        SELECT n.ano, n.municipio, n.nasc, o.obt
        FROM (SELECT d_dat.ano, d_mun.nome_municipio AS municipio,
                     SUM(f.quantidade_nascimentos) AS nasc
              FROM factnascimentos f
              JOIN dimdata d_dat ON d_dat.chave_data = f.chave_data
              JOIN dimmunicipio d_mun ON d_mun.chave_municipio = f.chave_municipio_nascimento
              GROUP BY 1, 2) n
        JOIN (SELECT d_dat.ano, d_mun.nome_municipio AS municipio,
                     SUM(f.quantidade_obitos) AS obt
              FROM factobitos f
              JOIN dimdata d_dat ON d_dat.chave_data = f.chave_data_obito
              JOIN dimmunicipio d_mun ON d_mun.chave_municipio = f.chave_municipio_obito
              GROUP BY 1, 2) o
        ON n.ano = o.ano AND n.municipio = o.municipio
        ORDER BY n.municipio, n.ano""",
      "topk" -> """
        WITH c AS (
          SELECT d2.descricao_familia, d.descricao_subcategoria,
                 SUM(f.quantidade_obitos) AS total_obitos,
                 ROW_NUMBER() OVER (PARTITION BY d2.descricao_familia
                                    ORDER BY SUM(f.quantidade_obitos) DESC,
                                             d.descricao_subcategoria) AS ranking
          FROM factobitos f
          JOIN pontegrupocausas p ON p.chave_grupo_causa = f.chave_grupo_causa
          JOIN dimcausa d ON d.chave_causa = p.chave_causa
          JOIN dimocupacao d2 ON d2.chave_ocupacao = f.chave_ocupacao
          WHERE p.ordem_causa = 1 AND d.codigo_cid != '0000'
          GROUP BY 1, 2)
        SELECT descricao_familia, descricao_subcategoria, total_obitos
        FROM c WHERE ranking <= 10
        ORDER BY descricao_familia, total_obitos DESC, descricao_subcategoria""")

    // Expected rows, once per query, through a reference connection.
    val ref = connectRetrying(servingUrl)
    val expected = queries.map { case (name, sql) =>
      name -> fetchAll(ref.createStatement().executeQuery(sql))
    }.toMap
    ref.close()
    expected.values.foreach(rows => assert(rows.nonEmpty))
    // 4 clients, each its own connection, all six queries, shuffled
    // per client so the server interleaves different statements.
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = (0 until 4).map { client =>
      Future {
        val conn = connectRetrying(servingUrl)
        try {
          val order = new scala.util.Random(client).shuffle(queries)
          order.map { case (name, sql) =>
            name -> fetchAll(conn.createStatement().executeQuery(sql))
          }
        } finally conn.close()
      }
    }
    val results = Await.result(Future.sequence(futures), 10.minutes)
    pool.shutdown()
    results.zipWithIndex.foreach { case (perClient, c) =>
      perClient.foreach { case (name, rows) =>
        assert(rows == expected(name), s"client $c query $name diverged")
      }
    }
  }
}
