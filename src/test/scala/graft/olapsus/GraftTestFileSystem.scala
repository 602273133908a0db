package graft.olapsus

import java.net.URI

/** A local-disk FileSystem registered under a NON-local URI scheme
  * (`graftfs://`) — stands in for an object-store connector in specs:
  * resolution goes through `fs.graftfs.impl` exactly as `s3a://` goes
  * through hadoop-aws, proving the ingest path never assumes
  * `java.io.File` semantics. Must be a top-level class: Hadoop
  * instantiates it reflectively. */
class GraftTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}
