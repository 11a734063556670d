package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.functions.Expressions.{minhash_signature, simhash64, word_shingles}

/** Deduplication suite for large-scale corpus curation: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale notes (the design constraint, per BASELINE targets):
  *  - Signatures (minhash/simhash) are computed with higher-order array
  *    functions in a single narrow pass — zero shuffle per document; the
  *    only shuffles are the final bucket group-bys, which are tiny
  *    because buckets carry ids, not text.
  *  - Candidate generation is bucket-local (LSH bands / simhash chunks /
  *    cosine blocking), never a full cross join; all-pairs exact Jaccard
  *    exists as the small-data oracle path only.
  */
object Dedup {

  /** Exact dedup: canonical first-write-wins representative per text key.
    * groupBy(min) rather than dropDuplicates so the surviving id is
    * deterministic (dropDuplicates keeps an arbitrary row).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(normalizeText(col(textCol)).as("text_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct word n-gram shingle array, computed per-row (no shuffle).
    * Documents shorter than n words contribute their whole text as the
    * single shingle.
    */
  def shingleArray(textCol: String, n: Int): Column =
    word_shingles(tokens(col(textCol)), n)

  /** Exploded inverted-index form: (id, shingle). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol), explode(shingleArray(textCol, n)).as("shingle"))

  /** Exact n-gram Jaccard similarity pairs (small-data / oracle path):
    * shingle inverted index self-joined on shingle, |A∩B| via group count,
    * |A∪B| = |A|+|B|-|A∩B|. The shingle join replaces the cross join —
    * only documents sharing at least one shingle ever meet.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n).cache()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val inter = sh.alias("a").join(sh.alias("b"),
        col("a.shingle") === col("b.shingle") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    // integer union size + a threshold test on integers x one double
    // multiply: exact, engine-independent (no rounding of the ratio)
    inter
      .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .filter(col("n_inter") >= lit(threshold) * col("n_union"))
      .withColumn("jaccard", col("n_inter") / col("n_union"))
      .select("id_a", "id_b", "n_inter", "n_union", "jaccard")
  }

  /** MinHash signature: k permutations approximated by k seeded hashes;
    * component i = min over shingles of xxhash64(shingle, seed=i). One
    * tight-loop pass per row (custom expression), no shuffle.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int): DataFrame =
    docs.select(col(idCol),
      minhash_signature(shingleArray(textCol, n), k).as("signature"))

  /** MinHash + LSH banding: split the k-component signature into `bands`
    * bands of k/bands rows, hash each band, bucket by (band, hash).
    * Candidate pairs are generated inside buckets (collect ids per bucket,
    * pair them with a higher-order comprehension), then scored by the
    * fraction of agreeing signature components — no text ever shuffles.
    * `maxBucket` guards against degenerate buckets (all-identical spam) —
    * the skew safety valve at scale.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 32, bands: Int = 8,
                      threshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    val r = k / bands
    val sigs = minhashSignatures(docs, idCol, textCol, n, k).cache()
    val buckets = sigs.select(col(idCol), explode(expr(
        s"transform(sequence(0, ${bands - 1}), c -> " +
        s"struct(c as band, hash(slice(signature, c * $r + 1, $r)) as bh))")).as("b"))
      .select(col(idCol), col("b.band"), col("b.bh"))
    // degenerate-bucket guard, then codegen'd self-join for pair generation
    // (a collect_set + lambda comprehension would evaluate interpreted)
    val bounded = buckets.join(
      buckets.groupBy("band", "bh").agg(count(lit(1)).as("__bn"))
        .filter(col("__bn").between(2, maxBucket)).drop("__bn"),
      Seq("band", "bh"), "left_semi")
    val pairs = bounded.alias("x").join(bounded.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    pairs
      .join(sigs.select(col(idCol).as("id_a"), col("signature").as("sig_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("signature").as("sig_b")), "id_b")
      .withColumn("est_jaccard", round(
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), eq -> eq))") / lit(k.toDouble), 4))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** 64-bit SimHash over whitespace tokens (custom expression, no
    * shuffle): per bit j, sum +-1 over token hashes; bit set where the
    * sum is positive.
    */
  def simhash(textCol: String): Column = simhash64(tokens(col(textCol)))

  /** SimHash near-dup pairs: pigeonhole banding — two docs within
    * `maxHamming` of each other must agree on at least one of
    * (maxHamming+1) disjoint bit chunks, so bucket by chunk value and
    * verify candidates with bit_count(xor). No cross join.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val sims = docs.select(col(idCol), simhash(textCol).as("simhash")).cache()
    val buckets = sims.select(col(idCol), col("simhash"), explode(expr(
        s"transform(sequence(0, ${chunks - 1}), c -> " +
        s"struct(c as chunk, shiftright(simhash, c * $width) & ${(1L << width) - 1} as cv))")).as("b"))
      .select(col(idCol), col("simhash"), col("b.chunk"), col("b.cv"))
    // bounded buckets -> codegen'd self-join; hamming via bit_count(xor)
    val bounded = buckets.join(
      buckets.groupBy("chunk", "cv").agg(count(lit(1)).as("__bn"))
        .filter(col("__bn").between(2, maxBucket)).drop("__bn"),
      Seq("chunk", "cv"), "left_semi")
    bounded.alias("x").join(bounded.alias("y"),
        col("x.chunk") === col("y.chunk") && col("x.cv") === col("y.cv") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding near-duplicate pairs: cosine >= threshold within blocking
    * groups (`blockCol`), never a global cross join. At 100 TB the block
    * key would come from a coarse quantizer (IVF cell / LSH signature) —
    * here any low-cardinality column serves.
    */
  def embeddingCosinePairs(embs: DataFrame, idCol: String, vecCol: String,
                           blockCol: String, threshold: Double): DataFrame = {
    // norms computed once per row (narrow), never per pair
    val a = embs.select(col(idCol).as("id_a"), col(vecCol).as("v_a"),
      Similarity.norm(col(vecCol)).as("n_a"), col(blockCol).as("blk"))
    val b = embs.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
      Similarity.norm(col(vecCol)).as("n_b"), col(blockCol).as("blk"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(
        Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
