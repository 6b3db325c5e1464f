package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math as codegen'd Spark column expressions — no UDFs
  * (SURVEY.md §2.L). The dot product folds left-to-right in double, so
  * the accumulation order is deterministic and reproducible across runs
  * (and bit-identical to the DuckDB oracle's sequential fold). */
object Vectors {

  /** Σ aᵢ·bᵢ over two array<float|double> columns, in double — a single
    * codegen'd JVM loop (graft.functions.VectorDot), not a
    * zip_with+aggregate HOF chain: same IEEE op sequence, none of the
    * per-element lambda dispatch or intermediate array. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vector_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
