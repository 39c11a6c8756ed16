package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leftmost-longest dictionary phrase spotting — the multi-word gazetteer
  * matcher (J5's big sibling). `Gazetteer.matchAgainst` links a WHOLE field
  * to a dictionary key; real mention detection must find dictionary phrases
  * INSIDE running text, non-overlapping, with the Aho-Corasick /
  * FlashText tie rule: scan left to right, at each uncovered position emit
  * the LONGEST dictionary phrase starting there and jump past it
  * (so "sort merge join" beats its nested suffix "merge join", and a match
  * consumes its tokens — an overlapping later candidate is suppressed).
  * This is the standard entity-mention spotter for KG construction
  * (vendor/product gazetteers over OCR text, zone_detector.py:89-97's
  * keyword scan generalized to multi-token phrases).
  *
  * Engine shape (no trie, no sequential scan over the corpus):
  *  1. the dictionary is normalized (whitespace-split, single-space
  *     re-joined) and BROADCAST — it is the bounded dimension; its
  *     distinct token-lengths are collected driver-side (dimension-scale);
  *  2. candidate generation is declarative: per dictionary length `l`, one
  *     codegen'd pass builds every l-gram of every document with a
  *     `transform(sequence)` HOF and equi-joins it against the broadcast
  *     dictionary — corpus rows never shuffle for candidates;
  *  3. the greedy selection is per-document: one doc-keyed aggregate
  *     collects that document's candidates (bounded by document length),
  *     sorts them (start asc, length desc), and replays the left-to-right
  *     scan with a single `aggregate` HOF fold — pure Catalyst, fully
  *     codegen, perfectly parallel across documents.
  *
  * Input ids must be unique per document (rows with the same id would have
  * their candidates merged into one scan). Output: one row per emitted
  * match — `(doc_id, start_tok, n_tokens, phrase)`, 1-based token
  * coordinates, `phrase` the normalized dictionary key. Deterministic. */
object PhraseSpot {

  /** Element type of the running selection in the fold accumulator. */
  private val selArrayType =
    "array<struct<start_tok:int,n_tokens:int,phrase:string>>"

  def spot(docs: DataFrame, id: Column, text: Column,
      phrases: DataFrame, phraseCol: String = "phrase"): DataFrame = {
    // Dictionary: whitespace-normalized key + token count. Distinct
    // lengths are collected on the driver — the dictionary is the
    // broadcast-bounded dimension, so this is a dimension-scale scan.
    val dict = phrases
      .where(col(phraseCol).isNotNull && length(trim(col(phraseCol))) > 0)
      .select(split(trim(col(phraseCol)), "\\s+").as("__pt"))
      .select(array_join(col("__pt"), " ").as("__key"),
        size(col("__pt")).as("__len"))
      .distinct()
    val lens: Seq[Int] = dict.select(col("__len")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

    if (lens.isEmpty) // empty dictionary matches nothing (Python any([]))
      return docs.select(id.as("doc_id")).limit(0)
        .withColumn("start_tok", lit(0L))
        .withColumn("n_tokens", lit(0L))
        .withColumn("phrase", lit(""))

    val toks = docs
      .where(text.isNotNull && length(trim(text)) > 0)
      .select(id.as("doc_id"), split(trim(text), "\\s+").as("__w"))

    // Candidate l-grams, one narrow pass per distinct dictionary length.
    val cand = lens.map { l =>
      toks.where(size(col("__w")) >= l)
        .select(col("doc_id"),
          explode(transform(
            sequence(lit(1), size(col("__w")) - (l - 1)),
            i => struct(i.as("start"),
              array_join(slice(col("__w"), i, lit(l)), " ").as("__key"))))
            .as("c"))
        .select(col("doc_id"), col("c.start").as("start"),
          lit(l).as("__len"), col("c.__key").as("__key"))
    }.reduce(_ unionAll _)
      .join(broadcast(dict), Seq("__key", "__len"))

    // Per-document greedy fold: sorted (start asc, len desc) candidates,
    // take a candidate iff it starts at or after the scan cursor.
    cand.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(
        col("start").as("s"), (-col("__len")).as("nl"),
        col("__len").as("l"), col("__key").as("k")))).as("cs"))
      .select(col("doc_id"),
        explode(aggregate(col("cs"),
          struct(lit(1).as("cur"),
            expr(s"CAST(array() AS $selArrayType)").as("sel")),
          (acc, x) => when(x("s") >= acc("cur"),
            struct((x("s") + x("l")).as("cur"),
              array_append(acc("sel"), struct(
                x("s").as("start_tok"), x("l").as("n_tokens"),
                x("k").as("phrase"))).as("sel")))
            .otherwise(acc),
          acc => acc("sel"))).as("m"))
      .select(col("doc_id"),
        col("m.start_tok").cast("long").as("start_tok"),
        col("m.n_tokens").cast("long").as("n_tokens"),
        col("m.phrase").as("phrase"))
  }
}
