package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.regexp_replace

/** One canonical form for data-file paths.
  *
  * Paths enter the system from several sources that disagree on scheme:
  * java.nio listings (`/tmp/...`), Hadoop listings (`file:/tmp/...`),
  * Spark's `_metadata.file_path` (`file:///tmp/...`), and user input. A
  * manifest `DataFile.filePath` is compared against all of them (conflict
  * validation, upsert file targeting, position-delete application), so
  * every producer canonicalizes here: local paths are scheme-less
  * absolute; remote URIs (hdfs://, s3a://) pass through untouched.
  */
object PathUtil {
  private val LocalScheme = "^file:/+".r

  def canon(p: String): String = LocalScheme.replaceFirstIn(p, "/")

  /** Column form, for `_metadata.file_path`. */
  def canonCol(c: Column): Column = regexp_replace(c, "^file:/+", "/")
}
