package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SentencePiece unigram tokenizer support, from scratch (the
  * `sentencepiece_model.proto` schema and the unigram-LM segmentation
  * algorithm (Kudo 2018) are public): read the `.model` protobuf real
  * published tokenizers ship, encode corpora by exact Viterbi over the
  * piece log-probs, and a writer twin for fixtures and model export.
  * The encoding kernel is [[graft.expressions.SpEncode]] — a native
  * expression, no UDF, no shuffle. Reference hook: curated-corpus
  * export, `aje_libs/documents/helpers/document_processor.py:10-83`
  * (tokenization is the terminal transform of the text pipeline; BPE
  * ([[Bpe]]) covers trained-here vocabularies, this covers the models
  * users already have).
  *
  * ModelProto subset: `pieces` (field 1; surface=1, score=2 float,
  * type=3 — UNKNOWN(2) marks the unk id). Trainer/normalizer specs are
  * skipped: encoding needs the pieces, and the normalizer defaults
  * (trim, collapse whitespace, ▁ escape, dummy prefix) are implemented
  * directly. Scores tie-break toward the longer final piece —
  * deterministic, engine-portable.
  */
object SentencePiece {

  final case class Piece(piece: String, score: Float, ptype: Int)

  val TypeNormal = 1
  val TypeUnknown = 2
  val TypeControl = 3
  val TypeUserDefined = 4
  val TypeByte = 6

  // ----------------------------------------------------------- proto read

  /** Parse a sentencepiece `.model` ModelProto to its piece list (id
    * order = repeated-field order). Refuses on structural damage.
    */
  def parseModel(b: Array[Byte]): Vector[Piece] = {
    require(b != null && b.nonEmpty, "empty sentencepiece model")
    val p = new Orc.Pb(b, 0, b.length)
    val out = Vector.newBuilder[Piece]
    while (p.hasMore) {
      p.tag() match {
        case (1, 2) =>
          val (o, n) = p.lenField()
          val pp = new Orc.Pb(b, o, o + n)
          var surface: String = null
          var score = 0.0f
          var ptype = TypeNormal
          while (pp.hasMore) {
            pp.tag() match {
              case (1, 2) =>
                val (so, sn) = pp.lenField()
                surface = new String(b, so, sn,
                  java.nio.charset.StandardCharsets.UTF_8)
              case (2, 5) =>
                require(pp.i + 4 <= pp.end, "truncated float score")
                var v = 0
                var k = 0
                while (k < 4) { v |= (b(pp.i + k) & 0xff) << (8 * k); k += 1 }
                pp.i += 4
                score = java.lang.Float.intBitsToFloat(v)
              case (3, 0) => ptype = pp.varint().toInt
              case (_, w) => pp.skip(w)
            }
          }
          require(surface != null, "sentencepiece piece without surface")
          out += Piece(surface, score, ptype)
        case (_, w) => p.skip(w)
      }
    }
    val r = out.result()
    require(r.nonEmpty, "sentencepiece model has no pieces")
    r
  }

  // ---------------------------------------------------------- proto write

  /** Writer twin: a minimal ModelProto carrying exactly the pieces (the
    * subset [[parseModel]] reads — fixtures, model export, and the
    * round-trip proof).
    */
  def writeModel(pieces: Seq[Piece]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(pieces.length * 16)
    def varint(v: Long): Unit = {
      var x = v
      var more = true
      while (more) {
        val b = (x & 0x7f).toInt
        x >>>= 7
        more = x != 0
        out.write(if (more) b | 0x80 else b)
      }
    }
    pieces.foreach { pc =>
      val one = new java.io.ByteArrayOutputStream(pc.piece.length + 12)
      val sb = pc.piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      one.write(0x0a) // field 1, wire 2
      var x = sb.length
      while ((x & ~0x7f) != 0) { one.write((x & 0x7f) | 0x80); x >>>= 7 }
      one.write(x)
      one.write(sb, 0, sb.length)
      one.write(0x15) // field 2, wire 5 (float)
      val bits = java.lang.Float.floatToIntBits(pc.score)
      var k = 0
      while (k < 4) { one.write((bits >> (8 * k)) & 0xff); k += 1 }
      if (pc.ptype != TypeNormal) {
        one.write(0x18) // field 3, wire 0
        one.write(pc.ptype)
      }
      out.write(0x0a) // ModelProto.pieces: field 1, wire 2
      varint(one.size().toLong)
      one.writeTo(out)
    }
    out.toByteArray
  }

  // -------------------------------------------------------- model surface

  /** Executor-shippable model from a piece list; `unkId` = the first
    * UNKNOWN-typed piece (-1 when absent — unknown transitions then
    * emit -1, a sentinel no real piece carries).
    */
  def model(pieces: Seq[Piece]): graft.expressions.SpModel =
    new graft.expressions.SpModel(
      pieces.map(p => (p.piece, p.score)).toArray,
      pieces.indexWhere(_.ptype == TypeUnknown),
      // only NORMAL / USER_DEFINED pieces match literal text; control
      // markers and unk keep their ids but never enter the lattice
      pieces.map(p => p.ptype == TypeNormal ||
        p.ptype == TypeUserDefined).toArray)

  /** Model from serialized `.model` bytes. */
  def modelFromBytes(b: Array[Byte]): graft.expressions.SpModel =
    model(parseModel(b))

  /** Encode column: piece-id array per row (empty for whitespace-only
    * text, NULL for NULL) — exact Viterbi under the model.
    */
  def encode(text: Column, m: graft.expressions.SpModel): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.SpEncode(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), m))

  /** Exact token count per row — the budget column for
    * [[TrainExport.packSequences]]-style packing in sentencepiece
    * vocabularies. NULL text counts NULL — ANSI-off legacy
    * `size(NULL) = -1` would silently SHRINK every pack/budget sum it
    * enters (the same guard [[Bpe.tokenCount]] carries).
    */
  def tokenCount(text: Column, m: graft.expressions.SpModel): Column =
    when(text.isNull, lit(null).cast("long"))
      .otherwise(size(encode(text, m)).cast("long"))

  /** Corpus-derived word-unigram model: one piece per distinct
    * whitespace-delimited word (▁-prefixed, uniform score), single-char
    * fallback pieces far below, UNKNOWN first. A self-trained stand-in
    * where no published model exists — whole words dominate Viterbi, so
    * token streams equal word streams (and stay SQL-replayable, which
    * the gate exploits). Word list is driver-bounded: refuse past
    * `maxVocab` distinct words.
    */
  def wordUnigramModel(docs: DataFrame, textCol: String,
      maxVocab: Int = 2000000): Vector[Piece] = {
    val words = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .distinct()
      .limit(maxVocab + 1)
      .collect().map(_.getString(0))
    require(words.length <= maxVocab,
      s"word vocabulary exceeds $maxVocab entries — train a real " +
        "subword model instead of the word-unigram stand-in")
    val wordPieces = words.map("▁" + _).sorted
      .map(Piece(_, -1.0f, TypeNormal))
    val chars = words.flatMap(_.toCharArray).distinct.sorted
      .map(c => Piece(c.toString, -100.0f, TypeNormal)) :+
      Piece("▁", -100.0f, TypeNormal)
    Piece("<unk>", 0.0f, TypeUnknown) +:
      (wordPieces ++ chars).toVector
  }
}
