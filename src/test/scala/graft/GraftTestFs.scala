package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A distinct-scheme Hadoop FileSystem (`graftfs://`) registered ONLY
  * through the session conf (a runtime `spark.conf.set("fs.graftfs
  * .impl", …)`, the same convention as runtime fs.s3a.* credentials)
  * — never in core-site defaults. Any connector code path that builds a bare
  * `new Configuration()` instead of threading the session conf fails
  * against this scheme with "No FileSystem for scheme: graftfs", so
  * the Round12 spec can prove the findb reader/writer resolve every
  * open (driver planning, executor part writes, executor partition
  * reads) under the session's Hadoop view — the HDFS/S3 deployment
  * contract, exercised without an HDFS.
  */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}
