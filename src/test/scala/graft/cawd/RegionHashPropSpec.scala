package graft.cawd

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Property-style test (seeded randomized layouts): for ANY region layout —
  * contiguous, gapped, overlapping, zero-size — over any file content, the
  * streaming windowed hasher must produce exactly the digest of each
  * region's bytes, and content mode must return those bytes verbatim.
  */
class RegionHashPropSpec extends AnyFunSuite {

  private def mk(path: String, seq: Int, start: Long, size: Long) =
    FileChunk(path, 0, seq, ChunkType.Regular, start, size, -1, "", -1,
      Array.emptyByteArray, Array.emptyByteArray)

  test("hashChunks == per-region direct SHA-1 for 100 random layouts") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 0 until 100) {
      val len = 1 + rnd.nextInt(64 * 1024)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      val f = Files.createTempFile("regionhash-prop", ".bin")
      try {
        Files.write(f, bytes)
        val n = 1 + rnd.nextInt(20)
        val layout = Seq.fill(n) {
          val start = rnd.nextInt(len)
          val size = rnd.nextInt(len - start + 1) // zero-size allowed
          (start.toLong, size.toLong)
        }.sortBy(_._1)
        val metas = layout.zipWithIndex.map { case ((s, sz), i) =>
          mk(f.toString, i, s, sz)
        }
        val hashed = RegionHash.hashChunks(f.toString, metas, withContent = true)
        assert(hashed.map(_.seq) == metas.map(_.seq), s"trial $trial order")
        hashed.foreach { c =>
          val expect = bytes.slice(c.start.toInt, (c.start + c.size).toInt)
          assert(java.util.Arrays.equals(c.content, expect),
            s"trial $trial content mismatch at ${c.start}+${c.size}")
          assert(java.util.Arrays.equals(c.signature, Sha1.of(expect)),
            s"trial $trial sha mismatch at ${c.start}+${c.size}")
        }
      } finally Files.deleteIfExists(f)
    }
  }
}
