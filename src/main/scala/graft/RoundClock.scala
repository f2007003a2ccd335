package graft

/** Per-round wall-clock ledger for the iterative trainers (VERDICT r13
  * next §3): `bpe_train_rich` and `gr_lpa_conv` are the two largest
  * bench line items (~8.5% of the suite) and pure iteration — a 2×
  * regression inside ONE round used to be visible only as a blended
  * query total. The training loops call [[time]] around each round's
  * materialization (the rounds end in an eager localCheckpoint, so the
  * body's wall-clock IS the round); Bench drains the ledger after each
  * timed run and emits a `rounds` map into bench_details.json, so a
  * round-level regression is attributable from the artifact alone.
  * Recording costs one nanoTime pair per ROUND (single-digit entries
  * per query) — always on, nothing to forget to enable. Stated round
  * budgets live in BASELINE.md next to the measured tables. */
object RoundClock {
  final case class Round(family: String, round: Int, sec: Double)
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[Round]()

  def time[T](family: String, round: Int)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    buf.add(Round(family, round, (System.nanoTime() - t0) / 1e9))
    r
  }

  /** Remove and return everything recorded since the last drain, in
    * insertion order. */
  def drain(): Seq[Round] = {
    val out = Seq.newBuilder[Round]
    var x = buf.poll()
    while (x != null) { out += x; x = buf.poll() }
    out.result()
  }
}
