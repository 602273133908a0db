package graft.olapsus

import graft.SparkSpecBase
import java.nio.file.Files
import java.sql.DriverManager

/** Integration test of the long-lived SQL endpoint: seeds + ingests a
  * warehouse, starts the Thrift server inside the session, and runs
  * roll-up #1 through a real JDBC client connection — the path a
  * dashboard takes against the reference (dashboard/app.py:29-32). */
class ServingEndpointSpec extends SparkSpecBase {

  test("firstRollUp is client-reachable over a JDBC connection") {
    val dir = Files.createTempDirectory("olapsus-serve")
    val wh = new Warehouse(spark, dir.resolve("wh").toString)
    Dims.seedAll(wh,
      Fixtures.write(dir, "municipio.csv", Fixtures.municipio),
      Fixtures.write(dir, "cbo.csv", Fixtures.cbo),
      Fixtures.write(dir, "cid.csv", Fixtures.cid))
    Pipeline.ingestSim(wh, Fixtures.write(dir, "sim.csv", Fixtures.sim), "2020-01-15")

    val port = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    val server = ServingEndpoint.start(wh, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val url = s"jdbc:hive2://localhost:$port/default"
      // The server binds asynchronously; retry the connection briefly.
      val conn = Iterator.range(0, 60).map { _ =>
        try Some(DriverManager.getConnection(url, "", ""))
        catch { case _: Exception => Thread.sleep(500); None }
      }.collectFirst { case Some(c) => c }
        .getOrElse(fail(s"endpoint at $url never became reachable"))

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
    } finally server.stop()
  }
}
