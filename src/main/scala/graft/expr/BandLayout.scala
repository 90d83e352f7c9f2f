package graft.expr

/** Pigeonhole band layout over a 64-bit fingerprint: `bands` chunks of
  * near-equal width (differing by <= 1 bit). Shared by
  * [[graft.llm.Dedup.simhashNearDup]] (Column side) and
  * [[graft.plans.HammingJoinRewrite]] (Expression side) so the two
  * banded paths can never drift — `dedup_simhash_complete` compares a
  * brute-force join against the banded operator, which only stays a
  * valid check while both derive identical bands.
  */
object BandLayout {

  /** (shift offset, mask) per band, lowest bits first. */
  def apply(bands: Int): Seq[(Int, Long)] = {
    require(bands >= 1 && bands <= 64, s"bands must be in [1,64] (got $bands)")
    val base = 64 / bands
    val rem = 64 % bands
    val widths = Seq.tabulate(bands)(b => if (b < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    Seq.tabulate(bands) { b =>
      val mask = if (widths(b) >= 64) -1L else (1L << widths(b)) - 1L
      (offsets(b), mask)
    }
  }
}
