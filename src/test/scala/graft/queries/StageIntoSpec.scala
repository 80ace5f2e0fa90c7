package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Pins the s01 wave-staging contract: same-filesystem staging HARDLINKS
  * (wave arrival is a metadata op), and only a cross-device destination
  * falls back to a byte copy. The round-13 s01 de-noise (fifth-decade
  * suite row 85.3 → 36.4 s) rests on the link path actually being taken —
  * a future edit that broke it (e.g. a Path/URI change making createLink
  * throw) would silently degrade to copies, and the only symptom would be
  * the s01 bench row creeping back up at the 1000× corpus with no
  * correctness signal. Byte-identity of the staged wave is asserted in
  * both branches (the engine's dedup oracle depends on it).
  */
class StageIntoSpec extends AnyFunSuite {

  private def tmpDir(prefix: String): java.io.File = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit(); d
  }

  test("same-filesystem staging hardlinks (nlink > 1), bytes identical") {
    val conf = new Configuration()
    val srcDir = tmpDir("stage-src")
    val dstDir = tmpDir("stage-dst") // both under java.io.tmpdir: same fs
    val src = new java.io.File(srcDir, "a.parquet")
    Files.write(src.toPath, "graft-wave-bytes".getBytes("UTF-8"))
    val fs = new Path(dstDir.toString).getFileSystem(conf)

    StreamingQueries.stageInto(fs, conf, Seq(src.toString),
      new Path(dstDir.toString), "zz_copy_")

    val dst = Paths.get(dstDir.toString, "zz_copy_a.parquet")
    assert(Files.exists(dst), "staged file missing")
    assert(java.util.Arrays.equals(Files.readAllBytes(dst),
      Files.readAllBytes(src.toPath)), "staged bytes differ from source")
    val nlink = Files.getAttribute(dst, "unix:nlink").asInstanceOf[Int]
    assert(nlink > 1,
      s"staged file is a COPY (nlink=$nlink), not a hardlink - the s01 " +
        "bench row is paying corpus-byte copies again")
  }

  test("cross-device staging falls back to a byte copy") {
    assume(new java.io.File("/dev/shm").isDirectory)
    val conf = new Configuration()
    val srcDir = tmpDir("stage-src2")
    val src = new java.io.File(srcDir, "b.parquet")
    Files.write(src.toPath, "graft-wave-bytes-2".getBytes("UTF-8"))
    val dstDir = Files.createTempDirectory(
      Paths.get("/dev/shm"), "stage-dst2").toFile // tmpfs: different device
    dstDir.deleteOnExit()
    // if tmpdir ever IS /dev/shm (same FileStore) the fallback path can't
    // be exercised from here — skip rather than pass vacuously
    assume(Files.getFileStore(src.toPath) != Files.getFileStore(dstDir.toPath),
      "src and dst share a FileStore; copy fallback not exercisable")
    val fs = new Path(dstDir.toString).getFileSystem(conf)

    StreamingQueries.stageInto(fs, conf, Seq(src.toString),
      new Path(dstDir.toString), "")

    val dst = Paths.get(dstDir.toString, "b.parquet")
    assert(Files.exists(dst), "cross-device fallback did not copy")
    assert(java.util.Arrays.equals(Files.readAllBytes(dst),
      Files.readAllBytes(src.toPath)), "copied bytes differ from source")
    // bytes-equal alone is also satisfied by a hardlink; nlink == 1 proves
    // this really was the COPY branch
    val nlink = Files.getAttribute(dst, "unix:nlink").asInstanceOf[Int]
    assert(nlink == 1,
      s"cross-device staging produced nlink=$nlink - a link, not a copy")
  }
}
