package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Codegen-friendly wrapper returning Catalyst array data directly
    * (consumed by [[graft.functions.BpeTokens]]).
    */
  def tokenizeArrayData(text: String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = tokenize(text)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(toks(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

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
  *
  * `byteFallback = true` (GPT-2-style byte coverage, requires a vocab
  * carrying all 256 `<0xNN>` byte tokens plus `</w>` — the
  * `bpe_vocab_bytes.txt` layout): an unknown token decomposes into the
  * UTF-8 byte tokens of its string (a `</w>`-suffixed unknown emits its
  * stem's bytes then the `</w>` id), so unseen scripts lose NO information
  * and [[decode]] round-trips the normalized text exactly. Semantics are
  * pinned token-for-token against `tools/gen_bpe_golden.py`'s
  * `encode_bytefallback` (bpe_ids_bytes_golden.tsv).
  */
final class BpeEncoder(val model: BpeModel, vocab: Array[String],
                       val byteFallback: Boolean = false) extends Serializable {
  require(vocab.nonEmpty, "vocab must at least contain the <unk> token at id 0")

  private val ids = new java.util.HashMap[String, Integer](vocab.length * 2)
  vocab.zipWithIndex.foreach { case (tok, i) => ids.putIfAbsent(tok, Integer.valueOf(i)) }

  private val byteIds: Array[Int] =
    if (!byteFallback) null
    else Array.tabulate(256) { i =>
      val v = ids.get(f"<0x$i%02X>")
      require(v != null, f"byteFallback vocab is missing byte token <0x$i%02X>")
      v.intValue()
    }
  private val eowId: Int =
    if (!byteFallback) -1
    else {
      val v = ids.get(BpeModel.Eow)
      require(v != null, s"byteFallback vocab is missing the ${BpeModel.Eow} token")
      v.intValue()
    }

  def idOf(token: String): Int = {
    val v = ids.get(token)
    if (v == null) 0 else v.intValue()
  }

  private def appendToken(tok: String, out: scala.collection.mutable.ArrayBuilder.ofInt): Unit = {
    val v = ids.get(tok)
    if (v != null) out += v.intValue()
    else if (!byteFallback) out += 0
    else {
      val stem = if (tok.endsWith(BpeModel.Eow)) tok.dropRight(BpeModel.Eow.length) else null
      val bytes = (if (stem != null) stem else tok).getBytes("UTF-8")
      var i = 0
      while (i < bytes.length) { out += byteIds(bytes(i) & 0xFF); i += 1 }
      if (stem != null) out += eowId
    }
  }

  /** `tokenize` then map each token to its id — ONE normalization rule
    * lives in [[BpeModel.tokenize]] (pinned by the Python golden).
    */
  def encode(text: String): Array[Int] = {
    val toks = model.tokenize(text)
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    out.sizeHint(toks.length)
    var i = 0
    while (i < toks.length) { appendToken(toks(i), out); i += 1 }
    out.result()
  }

  /** Inverse of [[encode]] under `byteFallback`: reconstructs the
    * NORMALIZED text (lowercased, single-space-joined words — the only
    * form the tokenizer ever sees). `<unk>` contributes nothing; `</w>`
    * (bare or as a token suffix) becomes the word separator.
    */
  def decode(encoded: Array[Int]): String = {
    val bytes = new java.io.ByteArrayOutputStream(encoded.length * 2)
    encoded.foreach { id =>
      if (id > 0 && id < vocab.length) {
        val tok = vocab(id)
        if (byteFallback && tok.length == 6 && tok.startsWith("<0x") && tok.endsWith(">"))
          bytes.write(Integer.parseInt(tok.substring(3, 5), 16))
        else if (tok == BpeModel.Eow) bytes.write(' ')
        else if (tok.endsWith(BpeModel.Eow)) {
          val b = tok.dropRight(BpeModel.Eow.length).getBytes("UTF-8")
          bytes.write(b, 0, b.length)
          bytes.write(' ')
        } else {
          val b = tok.getBytes("UTF-8")
          bytes.write(b, 0, b.length)
        }
      }
    }
    new String(bytes.toByteArray, "UTF-8").trim
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

  /** Persist a (trained) model in the same "a b" merge-line format
    * [[loadFile]] reads — train the vocab once with [[BpeTrainer]], save,
    * serve refit-free.
    */
  def saveFile(model: BpeModel, path: String): Unit = {
    val sb = new StringBuilder
    model.merges.foreach { case (a, b) => sb.append(a).append(' ').append(b).append('\n') }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), sb.toString.getBytes("UTF-8"))
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

  /** Subword tokens column (array<string>) through the native expression. */
  def tokensCol(text: Column, model: BpeModel): Column = {
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    bridge.column(graft.functions.BpeTokens(bridge.expression(text), model))
  }
}

/** Distributed BPE vocabulary training — the corpus-side half of the
  * tokenizer story ([[BpeModel]] applies what this learns). Semantics
  * mirror `tools/gen_bpe_golden.py`'s Sennrich-style trainer EXACTLY
  * (the spec compares merges token-for-token):
  * max-count pair per round, ties broken lexicographically on (a, b) —
  * Spark's binary UTF8String ordering IS code-point order (the UTF-8
  * bytewise property), matching Python's tuple-of-str comparison.
  *
  * Scale shape: the corpus is scanned ONCE into a distinct-word frequency
  * table (map-side-combinable groupBy — 100 TB of text compresses to the
  * word vocabulary); every merge round then runs over that bounded table:
  * adjacent-pair explode -> map-side-combinable sum -> TakeOrdered(1)
  * argmax. Driver state is the merge list alone. The symbol state evolves
  * INCREMENTALLY (each round folds only the newest merge into the arrays,
  * the same evolution as the reference trainer — re-tokenizing from
  * scratch with ranked merges can diverge when a later merge re-creates an
  * earlier pair's component string); lineage is truncated by a
  * localCheckpoint every `checkpointEvery` rounds so 200-round trainings
  * neither replay the corpus scan nor build unbounded plans.
  */
object BpeTrainer {

  /** Merge adjacent (a, b) occurrences left-to-right in one pass — the
    * fold is safe without a just-merged flag because the merged token
    * `a + b` can never equal `a` (b is nonempty), so a freshly appended
    * merge can never match as the LEFT side of the next element.
    */
  private def applyMergeCol(sym: Column, a: String, b: String): Column =
    aggregate(sym, lit(Array.empty[String]),
      (acc, s) => when(size(acc) > 0 &&
          element_at(acc, lit(-1)) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Learn up to `nMerges` ranked merges from the corpus text column. */
  def train(corpus: DataFrame, textCol: String, nMerges: Int,
            checkpointEvery: Int = 16): BpeModel = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    // ONE corpus scan: normalized word frequencies (the trainer's working
    // set — bounded by the distinct-word vocabulary, not corpus size)
    val words = corpus
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    // base symbols: code points + </w> (an empty-merge model's tokenize)
    val baseModel = new BpeModel(Array.empty)
    var state = words
      .select(BpeModel.tokensCol(col("word"), baseModel).as("sym"), col("cnt"))
      .localCheckpoint(true) // materialize: later rounds never rescan the corpus
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val best = state.filter(size(col("sym")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(0), size(col("sym")) - 2),
          i => struct(element_at(col("sym"), i + 1).as("a"),
            element_at(col("sym"), i + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(desc("c"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val next = state.select(applyMergeCol(col("sym"), a, b).as("sym"), col("cnt"))
        state = if ((round + 1) % checkpointEvery == 0) next.localCheckpoint(true) else next
        round += 1
      }
    }
    new BpeModel(merges.toArray)
  }
}
