package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-agnostic decimal quantization for oracle-compared outputs.
  *
  * `round(x, 4)` is NOT portable: Spark rounds via the exact decimal
  * expansion of the double (BigDecimal HALF_UP) while other engines
  * round via `nearbyint(x * 1e4)` — within half an ulp of a `.00005`
  * boundary the two disagree (observed on real fixture data). The
  * floor form below is the same double arithmetic everywhere, so any
  * engine evaluating `floor(x * 10000 + 0.5) / 10000.0` over the same
  * input double produces the bit-identical result. For negative x it
  * is round-half-toward-+inf rather than HALF_UP — acceptable for the
  * similarity/quality scores quantized here, where an exact negative
  * `.00005` boundary has measure zero.
  */
object Quantize {

  /** `floor(x * 10000 + 0.5) / 10000.0` — see object doc. */
  def quantize4(x: Column): Column =
    floor(x * 10000 + lit(0.5)) / 10000.0

  /** The DuckDB-SQL spelling of [[quantize4]], for oracle strings. */
  def quantize4Sql(expr: String): String =
    s"floor(($expr) * 10000 + 0.5) / 10000.0"
}
