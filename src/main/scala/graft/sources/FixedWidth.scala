package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-width record parsing — the mainframe/ERP extract format the
  * delimited readers can't touch: every field lives at a fixed byte
  * offset, right-padded with spaces, no delimiter anywhere (so a
  * value containing a comma or quote needs no escaping — the reason
  * the format survives). Spark has no fixed-width DataSource; the
  * idiomatic form is `spark.read.text` + a column of `substring`
  * slices, which this helper derives from a declared (name, width)
  * spec so offsets are computed once and can't drift apart by hand.
  */
object FixedWidth {

  /** Slice `lineCol` into one trimmed string column per spec entry
    * ((name, width) pairs, 1-based offsets accumulated in order).
    * Values are TRIM()ed of the pad spaces; type casts belong
    * downstream where the schema is declared (a fixed-width file
    * carries no types — pretending otherwise hides bad records).
    * Lines shorter than the spec yield empty strings for the missing
    * tail fields (substring past the end is empty — surfaced, not an
    * error, so a truncated record is countable). Duplicate or
    * non-positive-width fields refuse loudly.
    *
    * Scale: a pure row-local projection over whatever scan feeds it
    * — no shuffle, codegen-friendly (`substring`/`trim` are native
    * expressions), and the line column prunes away after the select. */
  def parse(df: DataFrame, lineCol: String,
      spec: Seq[(String, Int)]): DataFrame = {
    require(spec.nonEmpty, "spec must be non-empty")
    require(spec.map(_._1).distinct.size == spec.size,
      s"duplicate field names in spec: ${spec.map(_._1).mkString(", ")}")
    spec.foreach { case (n, w) =>
      require(w > 0, s"field $n needs a positive width (got $w)")
    }
    val offsets = spec.scanLeft(1) { case (o, (_, w)) => o + w }
    val cols: Seq[Column] = spec.zip(offsets).map { case ((n, w), off) =>
      trim(substring(col(lineCol), off, w)).as(n)
    }
    df.select(cols: _*)
  }

  /** Render the mirror image — one fixed-width line per row from the
    * given (column, width) spec, each value right-padded (and, loudly,
    * never silently truncated: a value wider than its field is a spec
    * bug that would corrupt every later offset). NULLs render as all
    * spaces, the format's only honest null. */
  def render(df: DataFrame, spec: Seq[(String, Int)],
      outCol: String = "line"): DataFrame = {
    require(spec.nonEmpty, "spec must be non-empty")
    val parts: Seq[Column] = spec.map { case (c, w) =>
      val s = coalesce(col(c).cast("string"), lit(""))
      when(length(s) > w,
        raise_error(concat(lit(s"fixed-width field $c overflows " +
          s"width $w: value '"), s, lit("'"))))
        .otherwise(rpad(s, w, " "))
    }
    df.select(concat(parts: _*).as(outCol))
  }
}
