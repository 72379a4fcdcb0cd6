package graft.io

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1-S3, S9-S11 — object-catalog operations
  * (`/root/reference/gcs_operations.go`), expressed over Hadoop
  * [[FileSystem]] so the same code drives posix, HDFS, or cloud object
  * stores. Listing returns a DataFrame (the catalog is data); the
  * copy/delete/mkdir calls are filesystem utilities with no query
  * semantics, exactly as in the reference.
  */
object FsOps {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** S1/S2 — list objects under a prefix (S2 = empty suffix filter), as a
    * DataFrame of (name, size). Mirrors the paginated
    * `GetFileNamesFromBucket` (`/root/reference/gcs_operations.go:58-85`) —
    * pagination is the FileSystem's concern here.
    */
  def list(spark: SparkSession, dir: String, suffix: String = ""): DataFrame = {
    import spark.implicits._
    val f = fs(spark, dir)
    val st = f.listStatus(new Path(dir))
    st.filter(_.isFile).map(s => (s.getPath.getName, s.getLen))
      .filter(_._1.endsWith(suffix))
      .sortBy(_._1)
      .toSeq.toDF("name", "size")
  }

  /** S3 — download one object's bytes (`/root/reference/embargo.go:283`). */
  def readBytes(spark: SparkSession, path: String): Array[Byte] = {
    val p = new Path(path)
    val in = fs(spark, path).open(p)
    try in.readAllBytes() finally in.close()
  }

  /** S9 — copy an object (server-side where the FS supports it;
    * `/root/reference/unembargo.go:124-130`).
    */
  def copy(spark: SparkSession, src: String, dst: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    FileUtil.copy(fs(spark, src), new Path(src), fs(spark, dst), new Path(dst),
      false, true, conf)
  }

  /** S10 — delete every object under a prefix
    * (`/root/reference/gcs_operations.go:87-128`).
    */
  def deletePrefix(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).delete(new Path(dir), true)

  /** S11 — idempotent bucket/dir create
    * (`/root/reference/gcs_operations.go:36-55`).
    */
  def mkdirs(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).mkdirs(new Path(dir))
}
