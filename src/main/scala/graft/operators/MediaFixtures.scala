package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import javax.imageio.ImageIO

/** Deterministic PNG + WAV fixture set for the REAL-decode multimodal
  * gates (qm02 images, qm03 audio): seeded-LCG pixel/sample noise at
  * per-id dimensions, encoded by the JDK's ImageIO PNG writer and
  * javax.sound.sampled WAV writer, plus `expected_meta.csv` /
  * `expected_audio.csv` sidecars recording each asset's intended
  * parameters and the actual encoded byte count.
  *
  * The sidecars are written in the same generation pass as the assets,
  * so the DuckDB oracle can state the expected metadata while the
  * Spark side must genuinely DECODE the bytes to reproduce it — the
  * dimensions / sample rates are not recoverable from the file name
  * or size.
  *
  * Driver-side by design: fixture authoring, not a distributed
  * operator (same stance as refstar.Fixtures).
  */
object MediaFixtures {

  /** Bump when fixture content changes so stale directories regenerate. */
  val Version = 2

  val Count = 64

  def root: String =
    sys.env.getOrElse("GRAFT_MEDIA_FIXTURE_DIR", "/root/repo/fixtures/media")

  def metaCsv: String = s"$root/expected_meta.csv"

  def audioCsv: String = s"$root/expected_audio.csv"

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
    generateAudio()
  }

  /** PCM_SIGNED 16-bit little-endian WAVs with per-id sample rate /
    * channel count / frame count and LCG sample noise.
    */
  private def generateAudio(): Unit = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val rates = Array(8000, 11025, 16000, 22050, 44100)
    val sb = new StringBuilder("media_id,sample_rate,channels,n_frames,n_bytes\n")
    (1 to Count).foreach { id =>
      val rate = rates(id % rates.length)
      val channels = 1 + id % 2
      val frames = 200 + (id * 37) % 800
      val data = new Array[Byte](frames * channels * 2)
      var seed = id * 0x9E3779B97F4A7C15L
      var i = 0
      while (i < data.length) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        data(i) = (seed >>> 32).toByte
        i += 1
      }
      val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      val bytes = bos.toByteArray
      Files.write(Paths.get(root, f"aud_$id%04d.wav"), bytes)
      sb.append(s"$id,$rate,$channels,$frames,${bytes.length}\n")
    }
    Files.write(Paths.get(audioCsv), sb.toString.getBytes)
  }
}
