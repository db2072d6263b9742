package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A local-backed Hadoop FileSystem registered under a NON-DEFAULT
  * scheme (`graftfs://`), standing in for the reference's cloud stage
  * (abfss external stages, rahil/create_stages.py:33-49) in a sandbox
  * with no network: Spark resolves the FileSystem implementation from
  * the URI scheme via `fs.<scheme>.impl`, which is exactly the code
  * path an Azure/S3/HDFS connector takes — so a read that works
  * through this scheme proves the stage reader does no local-path
  * assumptions (no java.io.File, no default-FS shortcuts).
  */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}
