package graft.sources

import graft.{SparkSpec, Tables}

/** [[Tables.snapshotId]] keys build-once artifacts (trained ANN
  * quantizers) by DATA identity. The contract that makes the memoizer
  * structural instead of conventional: the id is stable across calls on
  * unchanged files, and any rewrite — same bytes re-written (mtime),
  * different bytes (length/content) — changes it, so a stale model can
  * never silently serve after an in-place dataset rewrite.
  */
class SnapshotIdSpec extends SparkSpec {

  test("snapshotId is stable on unchanged files and moves on any rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toFile
    try {
      val src = new java.io.File("/root/testdata/sf0.001/embeddings.parquet")
      val dst = new java.io.File(dir, "embeddings.parquet")
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      val id1 = Tables.snapshotId(spark, dir.getPath, "embeddings")
      val id2 = Tables.snapshotId(spark, dir.getPath, "embeddings")
      assert(id1 == id2, "id must be stable across calls on unchanged files")

      // same content, new mtime — an in-place refresh must re-key
      assert(dst.setLastModified(dst.lastModified() + 5000))
      val id3 = Tables.snapshotId(spark, dir.getPath, "embeddings")
      assert(id3 != id1, "rewritten mtime must change the snapshot id")

      // different content (append a byte) — must re-key
      val out = new java.io.FileOutputStream(dst, true)
      try out.write(0) finally out.close()
      val id4 = Tables.snapshotId(spark, dir.getPath, "embeddings")
      assert(id4 != id3 && id4 != id1,
        "content change must change the snapshot id")

      // a renamed part file (same length, same mtime) must re-key: the
      // full URI enters the hash (r16 — the fold is over a SORTED
      // listing, so store iteration order can't re-key; the path can)
      val mt = dst.lastModified()
      val dst2 = new java.io.File(dir, "embeddings.parquet.renamed")
      assert(dst.renameTo(dst2))
      val probe = new java.io.File(dir, "embeddings.parquet")
      probe.mkdir()
      assert(dst2.renameTo(new java.io.File(probe, "part-00000.parquet")))
      new java.io.File(probe, "part-00000.parquet").setLastModified(mt)
      val id5 = Tables.snapshotId(spark, dir.getPath, "embeddings")
      assert(id5 != id4, "a moved/renamed file must change the snapshot id")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(dir)
    }
  }

  test("snapshotId reflects the real test dirs distinctly per scale") {
    val ids = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(sf => Tables.snapshotId(spark, s"/root/testdata/$sf", "embeddings"))
    assert(ids.distinct.length == 3, s"scale dirs must key distinctly: $ids")
  }
}
