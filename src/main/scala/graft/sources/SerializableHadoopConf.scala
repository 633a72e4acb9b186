package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration` (which is
  * `Writable` but not `Serializable`), so the SESSION'S Hadoop conf —
  * `spark.hadoop.*` credentials, fs.defaultFS, custom fs.<scheme>.impl
  * bindings — can ride a broadcast into connector read/write closures
  * instead of each task reconstructing a bare `new Configuration()`
  * that silently drops all of those. Serialized via the conf's own
  * `write`/`readFields` (the standard pattern for shipping Hadoop
  * confs through JVM serialization).
  */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
