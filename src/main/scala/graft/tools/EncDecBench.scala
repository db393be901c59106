package graft.tools
import graft.ops.ImageHash
object EncDecBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    // warm
    (0 until 3000).foreach { i => ImageHash.dHash64(ImageHash.fixturePng(i.toLong)) }
    (1 to 3).foreach { r =>
      var t0 = System.nanoTime(); var i = 0
      val pngs = new Array[Array[Byte]](n)
      while (i < n) { pngs(i) = ImageHash.fixturePng(i.toLong); i += 1 }
      val tEnc = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); i = 0; var acc = 0L
      while (i < n) { acc ^= ImageHash.dHash64(pngs(i)).getOrElse(0L); i += 1 }
      val tDec = (System.nanoTime() - t0) / 1e9
      println(f"[encdec] rep$r: encode $tEnc%.2f s  decode+hash $tDec%.2f s  ($n imgs, acc=$acc)")
    }
  }
}
