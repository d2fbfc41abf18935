package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration for graft's native Catalyst expressions, exposing
  * them to both the Column API (`cosineFast`) and SQL
  * (`SELECT graft_cosine(a, b)`).
  */
object GraftFunctions {

  val CosineName = "graft_cosine"
  val DotName = "graft_dot"
  val MinHashName = "graft_minhash"
  val SimHashName = "graft_simhash"
  val ShingleName = "graft_shingles"
  val ShinglePosName = "graft_shingles_pos"
  val ShingleLookupName = "graft_shingle_lookup"
  val NormalizeName = "graft_normalize"
  val JaroWinklerName = "graft_jaro_winkler"
  val DamerauName = "graft_damerau_levenshtein"
  val FixMojibakeName = "graft_fix_mojibake"
  val PorterStemName = "graft_porter_stem"

  private def minhashBuilder(exprs: Seq[Expression]): Expression = {
    val k = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$MinHashName: numHashes must be an integer literal, got $other")
    }
    MinHashSig(exprs(0), k)
  }

  private def shingleBuilder(exprs: Seq[Expression]): Expression = {
    val n = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$ShingleName: n must be an integer literal, got $other")
    }
    ShingleHash64(exprs(0), n)
  }

  private def shinglePosBuilder(exprs: Seq[Expression]): Expression = {
    val n = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$ShinglePosName: n must be an integer literal, got $other")
    }
    ShingleHashPos64(exprs(0), n)
  }

  private def lookupBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val n = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$ShingleLookupName: n must be an integer literal, got $other")
    }
    val wanted = exprs(2) match {
      case Literal(v: ArrayData, _) => v.toLongArray.toSeq
      case other => throw new IllegalArgumentException(
        s"$ShingleLookupName: wanted must be an array<long> literal, got $other")
    }
    ShingleLookup(exprs(0), n, wanted)
  }

  private def normalizeBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val form = exprs(1) match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
      case other => throw new IllegalArgumentException(
        s"$NormalizeName: form must be a string literal, got $other")
    }
    UnicodeNormalize(exprs(0), form)
  }

  private def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    CosineName -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    DotName -> (exprs => DotProduct(exprs(0), exprs(1))),
    MinHashName -> (minhashBuilder _),
    SimHashName -> (exprs => SimHashSig(exprs(0))),
    ShingleName -> (shingleBuilder _),
    ShinglePosName -> (shinglePosBuilder _),
    ShingleLookupName -> (lookupBuilder _),
    NormalizeName -> (normalizeBuilder _),
    JaroWinklerName -> (exprs => JaroWinkler(exprs(0), exprs(1))),
    DamerauName -> (exprs => DamerauLevenshtein(exprs(0), exprs(1))),
    FixMojibakeName -> (exprs => FixMojibake(exprs(0))),
    PorterStemName -> (exprs => PorterStem(exprs(0))))

  /** Idempotently register the functions on a session. Operators call
    * this before building plans that use the fast expressions.
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** Column-API handle (requires `register(spark)` on the session). */
  def cosineFast(a: Column, b: Column): Column = call_function(CosineName, a, b)

  /** Raw inner product (see [[DotProduct]]). */
  def dotFast(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** Codegen'd MinHash signature (requires `register(spark)`). */
  def minhashFast(shingles: Column, numHashes: Int): Column =
    call_function(MinHashName, shingles, org.apache.spark.sql.functions.lit(numHashes))

  /** Codegen'd SimHash sketch (requires `register(spark)`). */
  def simhashFast(tokens: Column): Column = call_function(SimHashName, tokens)

  /** Codegen'd distinct n-gram shingle hashes (requires `register`). */
  def shingleFast(tokens: Column, n: Int): Column =
    call_function(ShingleName, tokens, org.apache.spark.sql.functions.lit(n))

  /** Codegen'd POSITIONAL n-gram window hashes: element i hashes the
    * window starting at token i (requires `register`).
    */
  def shinglePosFast(tokens: Column, n: Int): Column =
    call_function(ShinglePosName, tokens, org.apache.spark.sql.functions.lit(n))

  /** Reverse lookup: strings of windows whose shingle hash is in
    * `wanted` (requires `register`). `wanted` is model-sized (a
    * collected candidate set), passed as a literal array.
    */
  def shingleLookup(tokens: Column, n: Int, wanted: Seq[Long]): Column =
    call_function(ShingleLookupName, tokens,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(wanted.toArray))

  /** Codegen'd Unicode normalization (requires `register`); `form`
    * is NFC/NFD/NFKC/NFKD.
    */
  def normalizeFast(text: Column, form: String = "NFC"): Column =
    call_function(NormalizeName, text,
      org.apache.spark.sql.functions.lit(form))

  /** Codegen'd Jaro-Winkler similarity (requires `register`). */
  def jaroWinklerFast(a: Column, b: Column): Column =
    call_function(JaroWinklerName, a, b)

  /** Codegen'd true Damerau-Levenshtein distance (requires `register`). */
  def damerauFast(a: Column, b: Column): Column =
    call_function(DamerauName, a, b)

  /** Codegen'd mojibake repair (requires `register`). */
  def fixMojibakeFast(text: Column): Column =
    call_function(FixMojibakeName, text)

  /** Codegen'd Porter stemmer (requires `register`). */
  def porterStemFast(word: Column): Column =
    call_function(PorterStemName, word)

  /** Builder handles for SparkSessionExtensions registration. */
  private[plans] def minhashBuilderPublic: Seq[Expression] => Expression = minhashBuilder
  private[plans] def shingleBuilderPublic: Seq[Expression] => Expression = shingleBuilder
}

/** Session extension injecting graft functions at session build time:
  *
  * {{{ SparkSession.builder().withExtensions(new GraftExtensions) }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_], builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    inject(GraftFunctions.CosineName, classOf[CosineSimilarity],
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    inject(GraftFunctions.DotName, classOf[DotProduct],
      exprs => DotProduct(exprs(0), exprs(1)))
    inject(GraftFunctions.MinHashName, classOf[MinHashSig],
      GraftFunctions.minhashBuilderPublic)
    inject(GraftFunctions.SimHashName, classOf[SimHashSig],
      exprs => SimHashSig(exprs(0)))
    inject(GraftFunctions.ShingleName, classOf[ShingleHash64],
      GraftFunctions.shingleBuilderPublic)
  }
}
