package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import com.esotericsoftware.kryo.{Kryo, KryoSerializable}
import com.esotericsoftware.kryo.io.{Input, Output}
import org.apache.hadoop.conf.Configuration

/** Serializable wrapper for a Hadoop `Configuration` (which is
  * `Writable` but not `Serializable`), so the SESSION'S Hadoop conf —
  * `spark.hadoop.*` credentials, fs.defaultFS, custom fs.<scheme>.impl
  * bindings — can ride a broadcast into connector read/write closures
  * instead of each task reconstructing a bare `new Configuration()`
  * that silently drops all of those. Serialized via the conf's own
  * `write`/`readFields` (the standard pattern for shipping Hadoop
  * confs through JVM serialization).
  *
  * Broadcast values are serialized with `spark.serializer`: under the
  * default JavaSerializer the `writeObject`/`readObject` hooks below
  * run, but under KryoSerializer those hooks are BYPASSED and the only
  * field is `@transient` — executors would deserialize `value = null`
  * and NPE in the first reader/writer task. The wrapper therefore also
  * implements Kryo's own `KryoSerializable` contract (`write`/`read`),
  * mirroring Spark's registration of a Kryo serializer for its internal
  * `SerializableConfiguration`, so the conf survives both serializers
  * byte-identically (both paths delegate to the conf's Writable form).
  */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable with KryoSerializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }

  override def write(kryo: Kryo, out: Output): Unit = {
    val dos = new java.io.DataOutputStream(out)
    value.write(dos)
    dos.flush()
  }
  override def read(kryo: Kryo, in: Input): Unit = {
    value = new Configuration(false)
    value.readFields(new java.io.DataInputStream(in))
  }
}
