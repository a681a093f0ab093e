package graft

import graft.ops.Bmp

/** mm_phash_hamming: perceptual-hash invariants the oracle gate can't
  * see (DuckDB cannot decode the container) — determinism, identical
  * payloads colliding at distance 0, robustness of the hash to a
  * single-pixel perturbation, and the banding's pigeonhole soundness.
  */
class PhashSpec extends SparkSpec {

  private def img(seed: Long): Bmp.Image = {
    val bytes = Array.tabulate[Byte](400)(i => ((i * 31 + seed) % 251).toByte)
    Bmp.decode(Bmp.synthesize(seed, bytes)).get
  }

  test("op output is deterministic and hashes are 16-hex-digit strings") {
    val a = SparkEntry.queries("mm_phash_hamming")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("mm_phash_hamming")(spark, sf).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getString(1).matches("[0-9A-F]{16}"))
      assert(r.getString(2).matches("[0-9A-F]{16}"))
    }
  }

  test("identical images hash identically (hamming 0)") {
    (0 until 10).foreach { i =>
      val x = img(i.toLong * 3 + 2)
      val y = img(i.toLong * 3 + 2)
      assert(Bmp.aHash(x) == Bmp.aHash(y))
      assert(Bmp.dHash(x) == Bmp.dHash(y))
    }
  }

  test("a single-pixel perturbation moves the hash by at most a few bits") {
    (0 until 10).foreach { i =>
      val base = img(i.toLong * 3 + 2)
      val px = base.pixels.clone()
      px(px.length / 2) ^= 0x10 // one mid-image pixel, one luma-visible bit
      val bumped = Bmp.Image(base.width, base.height, px)
      val dA = java.lang.Long.bitCount(Bmp.aHash(base) ^ Bmp.aHash(bumped))
      val dD = java.lang.Long.bitCount(Bmp.dHash(base) ^ Bmp.dHash(bumped))
      // One pixel touches one block of each grid: at most its own bit
      // plus the global-mean ripple (aHash) / two neighbor bits (dHash).
      assert(dA <= 8, s"seed $i: aHash moved $dA bits after one pixel")
      assert(dD <= 4, s"seed $i: dHash moved $dD bits after one pixel")
    }
  }

  test("banding is pigeonhole-sound for hamming <= 3") {
    // Any hash pair within distance 3 shares at least one of the 4
    // 16-bit bands — flipped bits can touch at most 3 bands.
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val h = rnd.nextLong()
      val flips = rnd.nextInt(4) // 0..3 bit flips
      var h2 = h
      (0 until flips).foreach(_ => h2 ^= 1L << rnd.nextInt(64))
      val shared = (0 until 4).exists(b => ((h >>> (b * 16)) & 0xffffL) == ((h2 >>> (b * 16)) & 0xffffL))
      assert(shared, f"no shared band for h=$h%016x h2=$h2%016x")
    }
  }

  test("images narrower than the 9-wide dHash grid still hash (clamped cells, no NaN)") {
    // width 8 < gw 9: the unclamped integer bounds would make cell
    // (0, y) empty and poison the grid with 0/0.
    val w = 8; val h = 8
    val px = Array.tabulate(w * h)(i => ((i * 40503) & 0xffffff).toInt)
    val im = Bmp.Image(w, h, px)
    val cells = Bmp.blockLuma(im, 9, 8)
    assert(cells.forall(c => !c.isNaN && c >= 0 && c <= 255.0001))
    assert(Bmp.dHash(im) == Bmp.dHash(im)) // defined + deterministic
  }

  test("block-mean grid averages the full image (mean of cells ~ mean luma on exact grids)") {
    // On images whose dimensions divide 8 evenly every cell has equal
    // area, so the cell-mean average equals the global mean luma.
    val w = 16; val h = 24
    val px = Array.tabulate(w * h)(i => ((i * 2654435761L) & 0xffffff).toInt)
    val im = Bmp.Image(w, h, px)
    val cells = Bmp.blockLuma(im, 8, 8)
    assert(math.abs(cells.sum / cells.length - im.meanLuma) < 1e-9)
  }
}
