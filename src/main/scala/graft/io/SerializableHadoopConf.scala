package graft.io

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Ships a Hadoop [[Configuration]] from the driver to executors.
  *
  * `Configuration` is not java-serializable but implements Hadoop's
  * `Writable`, so the entries are written with `Configuration.write` on
  * serialization and replayed into a defaults-free instance on
  * deserialization — the executor sees exactly the driver's session conf
  * (fs impls, object-store credentials, `spark.hadoop.*` overrides), not
  * whatever `new Configuration()` would pick up from the task classpath.
  */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {

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
