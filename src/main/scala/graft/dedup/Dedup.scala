package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftFunctions

/** Deduplication operators for large-scale text corpora — exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. (Beyond-reference capability
  * per the project brief; algorithms follow Broder 1997 "On the resemblance
  * and containment of documents" and Manku et al. WWW'07.)
  *
  * Scale design: every stage is a hash-partitioned groupBy/join on a
  * bounded key (normalized-text hash, LSH band key, SimHash chunk) — no
  * global windows, no driver-side loops, no O(n²) candidate generation.
  */
object Dedup {

  /** Canonical text normalization for dedup: lowercase, strip
    * non-word chars (Unicode-aware), collapse whitespace. The word class
    * is spelled `[\p{L}\p{N}_]` (not `(?U)\w`) so the exact same pattern
    * runs under Java regex here and RE2 in the DuckDB oracle.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(coalesce(c, lit(""))),
      "[^\\p{L}\\p{N}_\\s]", " "), "\\s+", " "))

  def tokensOf(c: Column): Column = split(normalizeText(c), " ")

  /** Word n-gram shingles (distinct). Texts shorter than n words collapse
    * to a single whole-text shingle.
    */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokensOf(c)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
        .otherwise(array(array_join(toks, " "))))
  }

  /** Exact dedup via hash-groupBy on normalized text: one output row per
    * distinct content, keeping the smallest id as canonical. Map-side
    * partial aggregation + AQE handle skew; the md5 key keeps the shuffle
    * row narrow even for megabyte documents.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(normalizeText(col(textCol))).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: `numHashes` independent min-hashes over the shingle
    * set. Implemented with the xxhash64 built-in seeded per permutation —
    * pure codegen, no UDF.
    */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shinglesCol, s => xxhash64(lit(i), s)))
    }: _*)

  /** MinHash+LSH candidate pairs: signatures are cut into `bands` bands of
    * `numHashes/bands` rows; documents sharing any band hash become
    * candidates; candidates are verified with the exact Jaccard similarity
    * of their shingle sets. Returns (id_a, id_b, jaccard) with
    * jaccard >= threshold and id_a < id_b.
    *
    * The band join is an equi-join on (band index, band hash) — fully
    * shuffle-partitioned, no cross join anywhere. At 100 TB the band table
    * is a few hundred bytes per doc; banding keeps candidate volume ~linear
    * for realistic duplicate rates.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val r = numHashes / bands

    val withSig = df
      .select(col(idCol).as("doc"), shingles(col(textCol), shingleN).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    val bandKeys = array((0 until bands).map { b =>
      struct(lit(b).as("band"), hash(slice(col("sig"), b * r + 1, r)).as("bk"))
    }: _*)

    val banded = withSig
      .select(col("doc"), explode(bandKeys).as("k"))
      .select(col("doc"), col("k.band").as("band"), col("k.bk").as("bk"))

    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()

    val sets = withSig.select(col("doc"), col("sh"))
    candidates
      .join(sets.as("sa"), col("id_a") === col("sa.doc"))
      .join(sets.as("sb"), col("id_b") === col("sb.doc"))
      .withColumn("jaccard",
        size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("double") /
          size(array_union(col("sa.sh"), col("sb.sh"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit fingerprints; candidates must share at
    * least one of `chunks` fingerprint chunks (pigeonhole: hamming <=
    * chunks-1 guarantees a shared chunk), then are verified with
    * bit_count(a^b) <= maxHamming. Chunk join = equi-join, same scale story
    * as LSH banding.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      chunks: Int = 4): DataFrame = {
    val bitsPerChunk = 64 / chunks
    val fp = df.select(col(idCol).as("doc"),
      GraftFunctions.simhash64(tokensOf(col(textCol))).as("fp"))

    val chunkKeys = array((0 until chunks).map { c =>
      struct(lit(c).as("chunk"),
        (shiftright(col("fp"), c * bitsPerChunk) bitwiseAND lit((1L << bitsPerChunk) - 1)).as("ck"))
    }: _*)

    val chunked = fp.select(col("doc"), col("fp"), explode(chunkKeys).as("k"))
      .select(col("doc"), col("fp"), col("k.chunk").as("chunk"), col("k.ck").as("ck"))

    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Direct n-gram Jaccard pairs via a shingle inverted index (no hashing
    * approximation): explode shingles, count shared shingles per pair, and
    * compute |A∩B| / (|A| + |B| - |A∩B|). Exact and fully SQL-expressible,
    * so it serves as the oracle-checked member of the dedup family.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol).as("doc"),
      explode(shingles(col(textCol), shingleN)).as("s"))
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))

    val common = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("n_common"))

    common
      .join(sizes.as("za"), col("id_a") === col("za.doc"))
      .join(sizes.as("zb"), col("id_b") === col("zb.doc"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("za.n_sh") + col("zb.n_sh") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
