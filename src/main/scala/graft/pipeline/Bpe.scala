package graft.pipeline

import org.apache.spark.sql.Column

/** Subword tokenization by byte-pair-encoding merges — the exact-count
  * upgrade over [[TextOps.tokenCount]]'s whitespace heuristic (which stays
  * available as the vocab-free fallback). The model is a ranked merge list
  * (the checked-in fixture comes from `tools/gen_bpe_golden.py`, a
  * from-scratch Sennrich-style trainer; any GPT-2-style `merges.txt` with
  * "a b" lines loads the same way).
  *
  * Semantics (mirrored bit-for-bit by the Python golden generator):
  * normalize = lowercase (root locale) + split on whitespace; a word's
  * symbols start as its code points plus a terminal `</w>`; repeatedly
  * merge the LOWEST-RANK adjacent pair present, all occurrences
  * left-to-right, until none applies.
  *
  * Scale shape: the model is one broadcast-sized reference object riding in
  * the native [[graft.functions.BpeCount]] expression (whole-stage codegen,
  * zero UDFs); per-row cost is O(word_len² · merges-hit) worst case with a
  * hash lookup per adjacent pair — the same loop every BPE implementation
  * runs.
  */
final class BpeModel(val merges: Array[(String, String)]) extends Serializable {
  import BpeModel.Eow

  private val ranks = new java.util.HashMap[String, Integer](merges.length * 2)
  merges.zipWithIndex.foreach { case ((a, b), i) =>
    ranks.put(a + "\u0000" + b, Integer.valueOf(i))
  }

  /** Apply the merges to one word (no whitespace inside). */
  def tokenizeWord(word: String): Array[String] = {
    // code-point symbols (not UTF-16 units), matching Python's iteration
    val base = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      base += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    base += Eow
    var sym = base.result()
    var done = false
    while (!done) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < sym.length - 1) {
        val r = ranks.get(sym(j) + "\u0000" + sym(j + 1))
        if (r != null && r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = merges(bestRank)
        val out = Array.newBuilder[String]
        j = 0
        while (j < sym.length) {
          if (j < sym.length - 1 && sym(j) == a && sym(j + 1) == b) { out += a + b; j += 2 }
          else { out += sym(j); j += 1 }
        }
        sym = out.result()
      }
    }
    sym
  }

  def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
      .filter(_.nonEmpty).flatMap(tokenizeWord)

  /** Exact subword token count (the serving hot path). */
  def countTokens(text: String): Int = {
    if (text == null) return 0
    val ws = text.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
    var n = 0
    var i = 0
    while (i < ws.length) {
      if (ws(i).nonEmpty) n += tokenizeWord(ws(i)).length
      i += 1
    }
    n
  }
}

/** BPE tokens to vocabulary ids: id = position in the vocab list (line
  * index of `bpe_vocab.txt`-style files); tokens absent from the vocab map
  * to `<unk>` = id 0 (the list's head by convention). Serializable so it
  * rides as a reference object in [[graft.functions.BpeEncode]].
  */
final class BpeEncoder(val model: BpeModel, vocab: Array[String]) extends Serializable {
  require(vocab.nonEmpty, "vocab must at least contain the <unk> token at id 0")

  private val ids = new java.util.HashMap[String, Integer](vocab.length * 2)
  vocab.zipWithIndex.foreach { case (tok, i) => ids.putIfAbsent(tok, Integer.valueOf(i)) }

  def idOf(token: String): Int = {
    val v = ids.get(token)
    if (v == null) 0 else v.intValue()
  }

  /** `tokenize` then map each token to its id — ONE normalization rule
    * lives in [[BpeModel.tokenize]] (pinned by the Python golden).
    */
  def encode(text: String): Array[Int] = {
    val toks = model.tokenize(text)
    val out = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = idOf(toks(i)); i += 1 }
    out
  }

  /** Codegen-friendly wrapper returning Catalyst array data directly. */
  def encodeArrayData(text: String): org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(encode(text))
}

object BpeModel {
  val Eow = "</w>"

  /** Parse "a b" merge lines (rank = line order; blank lines skipped). */
  def load(lines: Iterator[String]): BpeModel = {
    val merges = lines.map(_.trim).filter(_.nonEmpty).map { l =>
      val sp = l.indexOf(' ')
      require(sp > 0 && sp < l.length - 1, s"bad merge line: '$l'")
      (l.substring(0, sp), l.substring(sp + 1))
    }.toArray
    new BpeModel(merges)
  }

  def loadFile(path: String): BpeModel = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try load(src.getLines()) finally src.close()
  }

  /** Exact token-count column through the native expression. */
  def countCol(text: Column, model: BpeModel): Column = {
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    bridge.column(graft.functions.BpeCount(bridge.expression(text), model))
  }

  /** One token per line, id = line index (line 0 = `<unk>`). */
  def loadVocabFile(path: String): Array[String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().toArray finally src.close()
  }

  /** Token-id encoding column through the native expression. */
  def encodeCol(text: Column, encoder: BpeEncoder): Column = {
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    bridge.column(graft.functions.BpeEncode(bridge.expression(text), encoder))
  }
}
