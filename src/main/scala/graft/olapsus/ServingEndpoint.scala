package graft.olapsus

import org.apache.hive.service.server.HiveServer2
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

/** Long-lived SQL serving endpoint over the warehouse — the Spark-native
  * stand-in for the reference's dashboard→Postgres connection
  * (dashboard/app.py:29-32: SQLAlchemy + psycopg2 against postgres-olap).
  *
  * A HiveServer2-protocol Thrift server is started inside the warehouse
  * session with every warehouse table registered as a view, so any
  * JDBC/ODBC client (`jdbc:hive2://host:port`) can run the §2.8 serving
  * queries — or ad-hoc SQL — against live Spark. `singleSession` pins
  * all connections to the owning session's state so they see the
  * registered views (it must be set when the SparkSession is BUILT —
  * it is a static conf).
  *
  * At scale this is exactly the deployment shape Spark documents for a
  * shared SQL endpoint: one long-lived application holding the
  * warehouse catalog, clients multiplexed over Thrift, queries planned
  * with the same Catalyst pipeline as the batch path.
  */
object ServingEndpoint {

  // Return type is the public HiveServer2 superclass (the concrete
  // HiveThriftServer2 class is private[hive]); callers need only stop().
  def start(wh: Warehouse, port: Int): HiveServer2 = {
    wh.registerViews()
    val sql = wh.spark.sqlContext
    sql.setConf("hive.server2.thrift.port", port.toString)
    sql.setConf("hive.server2.thrift.bind.host", "localhost")
    HiveThriftServer2.startWithContext(sql)
  }
}

/** `runMain graft.olapsus.Serve --warehouse DIR [--port 10000]` — serve
  * the warehouse over JDBC until killed. */
object Serve {
  def main(args: Array[String]): Unit = {
    val a = Cli.parseArgs(args)
    val spark = graft.GraftSession.builder("olapsus-serve",
      graft.GraftSession.envCpus("4"))
      .config("spark.sql.hive.thriftServer.singleSession", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val port = a.getOrElse("port", "10000").toInt
    ServingEndpoint.start(new Warehouse(spark, a("warehouse")), port)
    println(s"serving warehouse ${a("warehouse")} at jdbc:hive2://localhost:$port")
    Thread.currentThread.join() // serve until killed
  }
}
