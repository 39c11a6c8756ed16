package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-Triples interchange — the line-oriented RDF serialization every
  * triple store speaks (W3C N-Triples, RDF 1.1): one `<s> <p> o .` per
  * line. This is how a KG built here ships to (or arrives from) an
  * external consumer — a serializer sink and a parser source over plain
  * text files, both pure Column expressions (whole-stage codegen, no
  * UDFs), so a 100 TB export is one narrow projection + text write and an
  * import is one narrow regex pass over a splittable text scan (N-Triples
  * is newline-delimited by design — the format exists so RDF dumps can be
  * processed line-parallel).
  *
  * Model mapping: the store's (subj, pred, obj) strings become IRIs under
  * a caller-supplied base prefix; `objIsIri` picks between an IRI object
  * and a literal object. Literal escaping follows the canonical form of
  * the spec (ECHAR: \\ \" \n \r \t — backslash FIRST, the classic
  * double-escape trap). Language tags and datatype IRIs are emitted when
  * their columns are non-null, and the parser returns them. */
object NTriples {

  /** Escape a literal per N-Triples ECHAR canonical form. */
  def escapeLiteral(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, lit("\\\\"), lit("\\\\\\\\")),      // \  -> \\   (first!)
      lit("\""), lit("\\\\\"")),             // "  -> \"
      lit("\n"), lit("\\\\n")),
      lit("\r"), lit("\\\\r")),
      lit("\t"), lit("\\\\t"))

  private def iri(c: Column): Column = concat(lit("<"), c, lit(">"))

  /** One N-Triples line. subj/pred are IRI strings (already absolute, or
    * prefix them upstream); obj is an IRI when `objIsIri`, else a literal
    * with optional `lang` (xx or xx-YY) or `datatype` (an absolute IRI) —
    * pass null columns to omit. A literal takes `lang` over `datatype`
    * when both are set (a lang-tagged literal's type IS rdf:langString —
    * the spec forbids writing both). */
  def line(subj: Column, pred: Column, obj: Column, objIsIri: Column,
      lang: Column = lit(null), datatype: Column = lit(null)): Column = {
    val literal = concat(lit("\""), escapeLiteral(obj), lit("\""),
      when(lang.isNotNull, concat(lit("@"), lang))
        .when(datatype.isNotNull, concat(lit("^^"), iri(datatype)))
        .otherwise(lit("")))
    concat_ws(" ", iri(subj), iri(pred),
      when(objIsIri, iri(obj)).otherwise(literal), lit("."))
  }

  /** Serialize to an N-Triples file tree (one text part-file per
    * partition — the splittable-dump layout). Columns: subj, pred, obj
    * (strings), obj_is_iri (boolean), optional lang / datatype. */
  def writeNT(df: DataFrame, path: String): Unit = {
    val lang = if (df.columns.contains("lang")) col("lang") else lit(null)
    val dt = if (df.columns.contains("datatype")) col("datatype") else lit(null)
    df.select(line(col("subj"), col("pred"), col("obj"), col("obj_is_iri"),
      lang, dt).as("value"))
      .write.mode("overwrite").text(path)
  }

  // subject/predicate: IRIs only (blank-node subjects are out of the
  // store's model — the pipeline skolemizes); object: IRI | literal with
  // optional @lang or ^^<dt>. Anchored, whitespace-tolerant, and the
  // literal body is non-greedy over escaped chars.
  private val LineRe =
    """^\s*<([^<>\s]+)>\s+<([^<>\s]+)>\s+(?:<([^<>\s]+)>|"((?:[^"\\]|\\.)*)"(?:@([A-Za-z]+(?:-[A-Za-z0-9]+)*)|\^\^<([^<>\s]+)>)?)\s*\.\s*$"""
  /** Unescape the five ECHARs (inverse of [[escapeLiteral]]). In a
    * well-formed literal every backslash starts an escape pair, so
    * SPLITTING on `\\\\` first removes all ambiguity: inside the segments
    * only the four single-char escapes remain, and re-joining with a
    * literal backslash restores the two-backslash escape -- no in-band
    * sentinel, no re-interpretation of an unescaped backslash by a later
    * pass (the inverse trap of escaping). \\uXXXX forms are out of scope
    * (the writer never emits them). */
  def unescapeLiteral(c: Column): Column = {
    def seg(s: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        s, lit("\\\\n"), lit("\n")),
        lit("\\\\r"), lit("\r")),
        lit("\\\\t"), lit("\t")),
        lit("\\\\\""), lit("\""))
    array_join(transform(split(c, "\\\\\\\\", -1), s => seg(s)), "\\")
  }

  /** Parse an N-Triples file tree (or any text path) back to rows:
    * (subj, pred, obj, obj_is_iri, lang, datatype, bad_line). Lines that
    * are blank or `#` comments are dropped (the spec allows both);
    * anything else unparsable comes back with null terms and the raw
    * text in bad_line — the error-row pattern of the OCR sources (filter
    * on `bad_line IS NULL` for the clean stream, audit the rest). */
  def readNT(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
      .where(trim(col("value")) =!= "" && !trim(col("value")).startsWith("#"))
    val g = (i: Int) => regexp_extract(col("value"), LineRe, i)
    raw.select(
      when(col("value").rlike(LineRe), g(1)).as("subj"),
      when(col("value").rlike(LineRe), g(2)).as("pred"),
      when(col("value").rlike(LineRe),
        when(g(3) =!= "", g(3)).otherwise(unescapeLiteral(g(4)))).as("obj"),
      when(col("value").rlike(LineRe), g(3) =!= "").as("obj_is_iri"),
      when(col("value").rlike(LineRe) && g(5) =!= "", g(5)).as("lang"),
      when(col("value").rlike(LineRe) && g(6) =!= "", g(6)).as("datatype"),
      when(!col("value").rlike(LineRe), col("value")).as("bad_line"))
  }
}
