package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sources.table

/** Distributed BPE tokenizer training + encoding — the tokenizer-prep
  * stage of an LLM data pipeline, in the word-count formulation every
  * production trainer uses (SentencePiece/HF tokenizers): the corpus
  * is scanned ONCE into a (word, count) table — vocabulary-sized, not
  * corpus-sized — and all merge learning happens against that table.
  *
  * Symbol sequences ride as space-delimited strings (" a b c "), so a
  * merge is one codegen'd `replace(seq, ' a b ', ' ab ')` — and both
  * Spark and DuckDB define replace() as LEFT-TO-RIGHT NON-OVERLAPPING,
  * which IS BPE's greedy merge order, so the gate replays bit-exact
  * (e.g. " a a a " merges to " aa a ", in both engines). Each round:
  * pair counts (scan-local bigrams over the symbol arrays, integer
  * sum weighted by word count), argmax with a total-order tiebreak
  * (count desc, then lexicographic — no float anywhere), then one
  * broadcast of the single winning row to rewrite the vocab. Ten
  * rounds here; a production 30k-merge train batches non-conflicting
  * merges per round, but the per-round dataflow is exactly this.
  *
  * Scale shape: the ONLY corpus-wide operation is the initial word
  * count (one shuffle on word, map-side combined). Pair counting
  * shuffles keys bounded by symbol-vocabulary², never corpus bytes;
  * the merge rewrite is map-side (1-row broadcast). Encoding joins
  * the corpus against the trained vocab — a broadcast, since a BPE
  * vocab is bounded — and aggregates counts per doc.
  *
  * The oracle re-derives ALL ten rounds from scratch in chained CTEs
  * (the pr_pagerank discipline): same word counts, same pair counts,
  * same argmax tiebreak, same replace arithmetic — nothing is a
  * fixture echo.
  */
object Bpe {

  type Q = (SparkSession, String) => DataFrame

  private val nMerges = 10

  /** " a b c " — leading sentinel space + one space after every
    * char, so every symbol is space-delimited on both ends. */
  private def charify(c: Column): Column =
    concat(lit(" "), regexp_replace(c, "(.)", "$1 "))

  /** The vocabulary table: distinct corpus words with occurrence
    * counts — the one corpus-wide aggregation in the whole pipeline. */
  private def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Run the merge loop; returns (merges, finalVocab) where merges is
    * (step, lsym, rsym, cnt) and finalVocab is (word, n, seq) after
    * all rounds. localCheckpoint per round (the dd_cluster CC-loop
    * idiom): without it each round's plan nests the previous round's
    * crossJoin + broadcast, and ten nested AQE stages spend more time
    * stringifying/replanning the tree than executing it (measured: the
    * un-truncated chain burned minutes of driver CPU in plan
    * toString). The checkpoint also bounds recomputation — each round
    * reads the vocab twice (pair counts + rewrite). */
  private def train(docs: DataFrame): (DataFrame, DataFrame) = {
    var seqs = wordCounts(docs)
      .select(col("word"), col("n"), charify(col("word")).as("seq"))
      .localCheckpoint()
    var merges: DataFrame = null
    for (i <- 1 to nMerges) {
      val pairs = seqs
        .select(col("n"), split(trim(col("seq")), " ").as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("n"), col("tk"),
          explode(sequence(lit(1), size(col("tk")) - 1)).as("j"))
        .select(element_at(col("tk"), col("j")).as("lsym"),
          element_at(col("tk"), col("j") + 1).as("rsym"), col("n"))
        .groupBy("lsym", "rsym").agg(sum(col("n")).as("cnt"))
      val best = pairs
        .orderBy(desc("cnt"), asc("lsym"), asc("rsym")).limit(1)
        .select(lit(i).cast("long").as("step"),
          col("lsym"), col("rsym"), col("cnt"))
        .localCheckpoint()
      merges = if (merges == null) best else merges.unionByName(best)
      seqs = seqs.crossJoin(broadcast(best.select("lsym", "rsym")))
        .select(col("word"), col("n"),
          expr("replace(seq, concat(' ', lsym, ' ', rsym, ' '), " +
            "concat(' ', lsym, rsym, ' '))").as("seq"))
        .localCheckpoint()
    }
    (merges, seqs)
  }

  /** bpe_train: the learned merge table — one row per round with the
    * pair's weighted count at selection time. */
  private val bpeTrain: Q = (s, d) =>
    train(table(s, d, "documents").select("text"))._1.orderBy("step")

  /** bpe_encode: tokenize the corpus with the trained merges. Word
    * instances join the encoded VOCAB (broadcast — vocabulary-sized),
    * so no per-instance string work happens: per-doc BPE token counts
    * are one integer aggregation. */
  private val bpeEncode: Q = (s, d) => {
    val docs = table(s, d, "documents")
    val enc = train(docs.select("text"))._2
      .select(col("word"),
        size(split(trim(col("seq")), " ")).cast("long").as("n_syms"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(enc), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_tokens_bpe"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "bpe_train" -> bpeTrain,
    "bpe_encode" -> bpeEncode)

  // ---------------------------------------------------------------
  // Oracle: the ten rounds as chained CTEs, re-derived from scratch.
  // ---------------------------------------------------------------
  private def roundCte(prev: String, i: Int): String =
    s""" pc$i AS (SELECT tk[g.j] AS lsym, tk[g.j+1] AS rsym,
       |            CAST(sum(n) AS BIGINT) AS cnt
       |          FROM (SELECT n, string_split(trim(seq), ' ') AS tk FROM $prev) t,
       |               LATERAL unnest(generate_series(1, len(tk) - 1)) g(j)
       |          GROUP BY lsym, rsym),
       | m$i AS (SELECT lsym, rsym, cnt FROM pc$i
       |         ORDER BY cnt DESC, lsym, rsym LIMIT 1),
       | s$i AS (SELECT word, n,
       |           replace(seq, ' ' || m$i.lsym || ' ' || m$i.rsym || ' ',
       |                        ' ' || m$i.lsym || m$i.rsym || ' ') AS seq
       |         FROM $prev CROSS JOIN m$i)""".stripMargin

  private def trainChain: String = {
    val rounds = (1 to nMerges)
      .map(i => roundCte(if (i == 1) "s0" else s"s${i - 1}", i))
      .mkString(",\n")
    s"""WITH w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS n
       |            FROM (SELECT unnest(string_split(text, ' ')) AS word
       |                  FROM documents)
       |            WHERE length(word) > 0 GROUP BY word),
       | s0 AS (SELECT word, n,
       |          ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
       |        FROM w0),
       |$rounds""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "bpe_train" -> {
      val union = (1 to nMerges)
        .map(i => s"SELECT CAST($i AS BIGINT) AS step, lsym, rsym, cnt FROM m$i")
        .mkString("\n UNION ALL ")
      s"""$trainChain
         |SELECT step, lsym, rsym, cnt FROM (
         | $union)
         |ORDER BY step""".stripMargin
    },
    "bpe_encode" ->
      s"""$trainChain,
         | enc AS (SELECT word,
         |           CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n_syms
         |         FROM s$nMerges),
         | inst AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |          FROM documents)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(n_syms) AS BIGINT) AS n_tokens_bpe
         |FROM (SELECT * FROM inst WHERE length(word) > 0) i
         |JOIN enc USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
