package graft.olapsus

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Landing-zone file listing over ANY Hadoop FileSystem.
  *
  * The reference enumerates `s3a://landing/source_sus/<dataset>/dt=<d>/`
  * with a py4j `FileSystem.globStatus` hop (spark_script_sim.py:13-25);
  * here the filesystem is resolved straight from the URI scheme via
  * `Path.getFileSystem`, so `s3a://`, `hdfs://`, `file:` and local bare
  * paths all take the same code path — an object store needs only its
  * connector jar + `fs.<scheme>.impl`/credential configuration on the
  * session, no code change. Listing is driver-side metadata (one RPC
  * per day partition), and the returned concrete file list feeds
  * `spark.read.csv(paths: _*)` directly, which also guards the
  * empty-day case without scanning anything.
  */
object Landing {

  /** All CSV files of one `dt=` day partition, fully-qualified in the
    * prefix's own scheme; empty when the day has no drop. */
  def listDay(spark: SparkSession, prefix: String, dataset: String, date: String): Seq[String] =
    listGlob(spark, s"$prefix/$dataset/dt=$date/*.csv")

  def listGlob(spark: SparkSession, glob: String): Seq[String] = {
    val pattern = new Path(glob)
    val fs = pattern.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(pattern)).toSeq.flatten.map(_.getPath.toString).sorted
  }
}
