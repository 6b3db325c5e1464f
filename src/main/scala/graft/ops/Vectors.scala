package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math as codegen'd Spark column expressions — no UDFs
  * (SURVEY.md §2.L). Arrays fold left-to-right in `aggregate`, so the
  * accumulation order is deterministic and reproducible across runs. */
object Vectors {

  /** Σ aᵢ·bᵢ over two array<float|double> columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
