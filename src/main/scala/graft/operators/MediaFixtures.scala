package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import javax.imageio.ImageIO

/** Deterministic PNG fixture set for the REAL-decode multimodal gate
  * (qm02): seeded-LCG pixel noise at per-id dimensions, encoded by the
  * JDK's ImageIO PNG writer, plus an `expected_meta.csv` sidecar
  * recording each image's intended width/height/channels and the
  * actual encoded byte count.
  *
  * The sidecar is written in the same generation pass as the PNGs, so
  * the DuckDB oracle can state the expected metadata while the Spark
  * side must genuinely DECODE the PNG bytes to reproduce it — the
  * dimensions are not recoverable from the file name or size.
  *
  * Driver-side by design: fixture authoring, not a distributed
  * operator (same stance as refstar.Fixtures).
  */
object MediaFixtures {

  /** Bump when fixture content changes so stale directories regenerate. */
  val Version = 1

  val Count = 64

  def root: String =
    sys.env.getOrElse("GRAFT_MEDIA_FIXTURE_DIR", "/root/repo/fixtures/media")

  def metaCsv: String = s"$root/expected_meta.csv"

  /** Generate (once) and return the fixture root. Thread-safe in-JVM. */
  def ensure(): String = synchronized {
    val marker = Paths.get(root, "VERSION")
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker)).trim == Version.toString
    if (!fresh) {
      generate()
      Files.write(marker, Version.toString.getBytes)
    }
    root
  }

  private def generate(): Unit = {
    Files.createDirectories(Paths.get(root))
    val sb = new StringBuilder("media_id,width,height,channels,n_bytes\n")
    (1 to Count).foreach { id =>
      val w = 16 + (id * 7) % 48
      val h = 16 + (id * 13) % 48
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      var seed = id * 2654435761L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          seed = seed * 6364136223846793005L + 1442695040888963407L
          img.setRGB(x, y, ((seed >>> 24) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      val bytes = bos.toByteArray
      Files.write(Paths.get(root, f"img_$id%04d.png"), bytes)
      sb.append(s"$id,$w,$h,3,${bytes.length}\n")
    }
    Files.write(Paths.get(metaCsv), sb.toString.getBytes)
  }
}
