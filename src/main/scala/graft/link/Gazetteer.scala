package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J5 — keyword / gazetteer membership (SURVEY.md §2.3).
  *
  * The reference scans small keyword lists per text
  * (zone_detector.py:89-97,135-143,173-183; config vlm_config.json:29-33).
  * Two Spark forms, chosen by list size:
  *
  *  - `rlike` alternation for FIXED small keyword sets: compiled once into
  *    codegen, zero join (the engine choice for header/footer keywords);
  *  - broadcast join for REAL gazetteers (vendors, products — thousands to
  *    millions of rows): the dimension is broadcast, the fact table is
  *    never shuffled.
  */
object Gazetteer {

  /** Compiled-alternation membership: true iff any keyword occurs in the
    * text (case-insensitive substring semantics, like Python `kw in text`). */
  def containsAnyKeyword(text: Column, keywords: Seq[String]): Column =
    // Python `any([])` is False — an empty keyword list matches NOTHING
    // (the naive "(?i)" pattern would match everything); empty-string
    // keywords are dropped for the same reason
    keywords.filter(_.nonEmpty) match {
      case Nil => lit(false)
      case ks  => text.rlike("(?i)" + ks.map(java.util.regex.Pattern.quote).mkString("|"))
    }

  /** Keyword hit ratio vs a confidence threshold — the reference's zone
    * scoring shape (zone_detector.py:89-125, threshold 0.3). */
  def keywordScore(text: Column, keywords: Seq[String]): Column =
    if (keywords.isEmpty) lit(0.0) // Python sum([])/max(len,1) shape: no keywords → 0
    else {
      val tl = lower(text)
      val hits = keywords.map(k => when(tl.contains(k.toLowerCase(java.util.Locale.ROOT)), 1)
        .otherwise(0)).reduce(_ + _)
      hits.cast("double") / keywords.size
    }

  /** Broadcast-gazetteer match: annotate `df` rows with the canonical
    * gazetteer entry whose normalized key equals the normalized value of
    * `matchCol` (left join — unmatched rows keep null). The gazetteer side
    * is explicitly broadcast: it is the bounded-small dimension. */
  def matchAgainst(df: DataFrame, matchCol: String,
      gazetteer: DataFrame, gazKeyCol: String, outCol: String = "gazetteer_match"): DataFrame = {
    def norm(c: Column) =
      regexp_replace(regexp_replace(lower(c), "[^a-z0-9]+", "_"), "^_|_$", "")
    val dim = broadcast(gazetteer.select(
      norm(col(gazKeyCol)).as("__gaz_key"), col(gazKeyCol).as(outCol)).distinct())
    df.join(dim, norm(col(matchCol)) === col("__gaz_key"), "left").drop("__gaz_key")
  }
}
