package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, the GPT-2
  * training scheme): TRAINING is a driver-side job over a bounded
  * deterministic sample (like the k-means codebooks of the ANN stack —
  * a merge table needs thousands of examples, not 10^9), ENCODING is
  * the distributed hot path and runs as a native Catalyst expression
  * whose generated code calls [[BpeCodec.encodeText]] with the merge
  * ranks attached as a codegen reference object — no Scala-UDF ser/de
  * boundary, stays inside whole-stage codegen.
  */
object BpeCodec {

  /** Greedy merge-rank table: (left, right) -> rank (lower = earlier
    * merge = higher priority). Keys are flattened to "left right" so
    * the generated Java can probe a plain HashMap without tuple
    * allocation per candidate pair.
    */
  final class Ranks(val m: java.util.HashMap[String, Integer]) extends Serializable

  def ranksOf(merges: Seq[(String, String)]): Ranks = {
    val h = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) => h.put(l + " " + r, i) }
    new Ranks(h)
  }

  /** Deterministic BPE training over a word-frequency map: `numMerges`
    * rounds, each merging the most frequent adjacent symbol pair
    * (ties break lexicographically — (left, right) smallest — so two
    * engines/runs can never learn different vocabularies from the
    * same sample). O(rounds × corpus-types); the sample is bounded so
    * this is driver-milliseconds.
    */
  def train(wordFreq: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] =
      wordFreq.groupBy { case (w, _) => w.map(_.toString).toVector }
        .map { case (syms, ws) => syms -> ws.values.sum }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        words = words.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> f
        }.groupBy(_._1).map { case (k, vs) => k -> vs.values.sum }
      }
      round += 1
    }
    merges.result()
  }

  /** Encode one word: start from characters, repeatedly apply the
    * LOWEST-RANK merge present until none applies (the exact GPT-2
    * greedy loop). Linear-ish in practice; worst case O(len²) per
    * word with len bounded by real-token lengths.
    */
  def encodeWord(word: String, ranks: Ranks): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = new java.util.ArrayList[String](word.length)
    var ci = 0
    while (ci < word.length) { syms.add(String.valueOf(word.charAt(ci))); ci += 1 }
    var continue = syms.size > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.m.get(syms.get(i) + " " + syms.get(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else {
        syms.set(bestIdx, syms.get(bestIdx) + syms.get(bestIdx + 1))
        syms.remove(bestIdx + 1)
        if (syms.size < 2) continue = false
      }
    }
    val out = new Array[String](syms.size)
    var j = 0
    while (j < out.length) { out(j) = syms.get(j); j += 1 }
    out
  }

  /** Whole-text encode: whitespace pre-tokenize (empty runs skipped),
    * per-word BPE, pieces concatenated in order. Called from the
    * expression's generated code — one invocation per row.
    */
  def encodeText(text: UTF8String, ranks: Ranks): ArrayData = {
    val pieces = new java.util.ArrayList[UTF8String]()
    val s = text.toString
    var start = 0
    val n = s.length
    while (start < n) {
      while (start < n && s.charAt(start) == ' ') start += 1
      var end = start
      while (end < n && s.charAt(end) != ' ') end += 1
      if (end > start) {
        val ps = encodeWord(s.substring(start, end), ranks)
        var i = 0
        while (i < ps.length) { pieces.add(UTF8String.fromString(ps(i))); i += 1 }
      }
      start = end
    }
    new GenericArrayData(pieces.toArray)
  }
}

/** `bpe_encode(text)` with a trained merge table bound at plan time:
  * returns the BPE piece array for the whitespace-tokenized text.
  * The ranks object rides into generated code as a codegen reference
  * constant (the NearestCentroid device), so encoding is one static
  * call per row inside whole-stage codegen.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val ranks = BpeCodec.ranksOf(merges)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_encode expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    BpeCodec.encodeText(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, classOf[BpeCodec.Ranks].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.BpeCodec.encodeText($c, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
