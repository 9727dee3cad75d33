package graft.text

import com.fasterxml.jackson.databind.ObjectMapper

/** Save/load for the three learned tokenizer models — the
  * fit-once-ship-everywhere contract the [[graft.ml.LangModel]] and
  * [[graft.ml.QualityModel]] families already have: at 100 TB a
  * tokenizer trains once on the word dictionary, the model file ships
  * with the pipeline, and every later job (packing, budget counting,
  * streaming ingest) loads it instead of retraining — retraining per
  * job would silently re-derive a DIFFERENT vocabulary whenever the
  * corpus moved, changing token counts mid-pipeline.
  *
  * One JSON file per model (Jackson on Spark's own classpath — the
  * [[graft.sources.Snapshot]] manifest precedent; doubles round-trip
  * through Jackson's shortest-representation printing, so a loaded
  * unigram model scores BIT-IDENTICALLY). Collections serialize
  * SORTED so the file is byte-deterministic for a given model —
  * diffable, content-addressable, golden-pinnable. */
object TokenizerIo {

  // ---- BPE ---------------------------------------------------------------

  def saveBpe(m: Bpe.BpeModel, path: String): Unit = {
    val om = new ObjectMapper()
    val root = om.createObjectNode()
    root.put("family", "bpe")
    val merges = root.putArray("merges")
    m.merges.foreach { case (a, b) =>
      val p = merges.addArray(); p.add(a); p.add(b) }
    val alpha = root.putArray("alphabet")
    m.alphabet.toSeq.sorted.foreach(alpha.add)
    write(path, om.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root))
  }

  def loadBpe(path: String): Bpe.BpeModel = {
    val root = readTree(path, "bpe")
    val merges = Vector.newBuilder[(String, String)]
    root.get("merges").elements().forEachRemaining { p =>
      merges += ((p.get(0).asText(), p.get(1).asText())) }
    val alpha = Set.newBuilder[String]
    root.get("alphabet").elements()
      .forEachRemaining(n => alpha += n.asText())
    Bpe.BpeModel(merges.result(), alpha.result())
  }

  // ---- unigram -----------------------------------------------------------

  def saveUnigram(m: Unigram.UnigramModel, path: String): Unit = {
    val om = new ObjectMapper()
    val root = om.createObjectNode()
    root.put("family", "unigram")
    val logp = root.putObject("logp")
    m.logp.toSeq.sortBy(_._1).foreach { case (piece, lp) =>
      logp.put(piece, lp) }
    write(path, om.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root))
  }

  def loadUnigram(path: String): Unigram.UnigramModel = {
    val root = readTree(path, "unigram")
    val b = Map.newBuilder[String, Double]
    val logp = root.get("logp")
    val names = logp.fieldNames()
    while (names.hasNext) {
      val piece = names.next()
      b += piece -> logp.get(piece).asDouble()
    }
    Unigram.UnigramModel(b.result())
  }

  // ---- WordPiece ---------------------------------------------------------

  def saveWordPiece(m: WordPiece.WordPieceModel, path: String): Unit = {
    val om = new ObjectMapper()
    val root = om.createObjectNode()
    root.put("family", "wordpiece")
    root.put("maxInputChars", m.maxInputChars)
    val vocab = root.putArray("vocab")
    m.vocab.toSeq.sorted.foreach(vocab.add)
    val merges = root.putArray("merges")
    m.merges.foreach(merges.add)
    val alpha = root.putArray("alphabet")
    m.alphabet.toSeq.sorted.foreach(alpha.add)
    write(path, om.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root))
  }

  def loadWordPiece(path: String): WordPiece.WordPieceModel = {
    val root = readTree(path, "wordpiece")
    def strings(field: String): Seq[String] = {
      val b = Seq.newBuilder[String]
      root.get(field).elements().forEachRemaining(n => b += n.asText())
      b.result()
    }
    WordPiece.WordPieceModel(strings("vocab").toSet,
      strings("merges").toVector, strings("alphabet").toSet,
      root.get("maxInputChars").asInt())
  }

  // ---- io ----------------------------------------------------------------

  private def write(path: String, json: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
  }

  /** Parse + family check: loading a unigram file as BPE must fail
    * with the real reason, not a NullPointerException three calls
    * later. */
  private def readTree(path: String, family: String)
      : com.fasterxml.jackson.databind.JsonNode = {
    val root = new ObjectMapper().readTree(new java.io.File(path))
    val found = Option(root.get("family")).map(_.asText()).getOrElse("?")
    require(found == family,
      s"$path is a '$found' model, expected '$family'")
    root
  }
}
