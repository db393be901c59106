package graft.tools

import graft.ops.ImageHash

/** Throwaway A/B: ImageIO.read-style decode vs the reader-based
  * header-checked path vs an explicit memory-cached stream. */
object DecodeBench {
  def oldStyle(bytes: Array[Byte]): Option[Long] = {
    val decoded =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    decoded.map { img =>
      val g = ImageHash.boxDownscale(ImageHash.grayPlane(img),
        img.getWidth, img.getHeight, 9, 8)
      var hash = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (g(y * 9 + x + 1) > g(y * 9 + x)) hash |= 1L << (y * 8 + x)
      hash
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val pngs = (0 until n).map(i => MediaProbe.bigFixturePng(i.toLong, perturb = false)).toArray
    def bench(label: String)(f: Array[Byte] => Option[Long]): Unit = {
      // warmup
      var i = 0; var acc = 0L
      while (i < math.min(n, 5000)) { acc ^= f(pngs(i)).getOrElse(0L); i += 1 }
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        i = 0
        while (i < n) { acc ^= f(pngs(i)).getOrElse(0L); i += 1 }
        println(f"[bench] $label rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s (acc=$acc)")
      }
    }
    def memStyle(bytes: Array[Byte]): Option[Long] = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val (w, h) = (reader.getWidth(0), reader.getHeight(0))
            if (w <= 0 || h <= 0 || w.toLong * h > ImageHash.MaxPixels) None
            else {
              val img = reader.read(0)
              val g = ImageHash.boxDownscale(ImageHash.grayPlane(img),
                img.getWidth, img.getHeight, 9, 8)
              var hash = 0L
              for (y <- 0 until 8; x <- 0 until 8)
                if (g(y * 9 + x + 1) > g(y * 9 + x)) hash |= 1L << (y * 8 + x)
              Some(hash)
            }
          } finally reader.dispose()
        }
      } finally iis.close()
    }
    bench("old ImageIO.read")(oldStyle)
    bench("new reader-based")(b => ImageHash.dHash64(b))
    bench("memory-cached stream")(memStyle)
    // parity sanity
    require((0 until 1000).forall(i => oldStyle(pngs(i)) == ImageHash.dHash64(pngs(i))))
    println("[bench] parity ok")
  }
}
