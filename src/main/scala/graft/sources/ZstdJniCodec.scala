package graft.sources

import java.io.{InputStream, OutputStream}

import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}
import org.apache.hadoop.conf.{Configurable, Configuration}
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream, CompressionOutputStream, Compressor, Decompressor}

/** Hadoop `CompressionCodec` for `.zst` members backed by zstd-jni (the
  * library Spark itself ships for shuffle/ORC compression) instead of
  * Hadoop's built-in `ZStandardCodec`, which requires a native libhadoop
  * build that this deployment — like many Spark-on-K8s images — does not
  * carry (its `createOutputStream` throws `native-zstd library not
  * available`).
  *
  * Stream-only: `Compressor`/`Decompressor` pooling is not supported
  * (both types report null, which `CodecPool` treats as "codec manages
  * its own streams" and passes null back into `createInputStream`/
  * `createOutputStream`, where it is ignored). Zstd frames are not
  * splittable — same single-split-per-file posture as gzip; prefer many
  * members at scale (COVERAGE.md).
  *
  * Registration: [[ZstdJniCodec.register]] appends this class to
  * `io.compression.codecs`, after which Hadoop's `CompressionCodecFactory`
  * resolves `.zst` files to it for every TextInputFormat-based read
  * (dump statement scan, CSV/JSONL line readers).
  */
final class ZstdJniCodec extends CompressionCodec with Configurable {
  private var conf: Configuration = _
  override def setConf(c: Configuration): Unit = conf = c
  override def getConf: Configuration = conf

  override def getDefaultExtension: String = ".zst"

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new CompressionOutputStream(out) {
      private val z = new ZstdOutputStream(this.out)
      private var finished = false
      override def write(b: Int): Unit = z.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = z.write(b, off, len)
      override def finish(): Unit = if (!finished) { z.flush(); finished = true }
      override def resetState(): Unit = ()
      override def flush(): Unit = z.flush()
      override def close(): Unit = { z.close() } // closes the zstd frame + `out`
    }

  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out) // stream-managed; pooled compressor (null) ignored

  override def createInputStream(in: InputStream): CompressionInputStream =
    new CompressionInputStream(in) {
      private val z = new ZstdInputStream(this.in)
      override def read(): Int = z.read()
      override def read(b: Array[Byte], off: Int, len: Int): Int = z.read(b, off, len)
      override def resetState(): Unit = ()
      override def close(): Unit = z.close()
    }

  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)

  // Null types signal CodecPool that this codec has no poolable
  // compressor machinery; it then passes null through to the stream
  // factories above, which ignore it.
  override def getCompressorType: Class[_ <: Compressor] = null
  override def createCompressor(): Compressor = null
  override def getDecompressorType: Class[_ <: Decompressor] = null
  override def createDecompressor(): Decompressor = null
}

object ZstdJniCodec {
  /** Append this codec to `io.compression.codecs` (idempotent) so the
    * codec factory maps `.zst` to it. The default factory list is only
    * consulted when the key is UNSET, so the append must re-list the
    * defaults' behavior — passing the full default list explicitly would
    * hardcode Hadoop internals; instead an unset key becomes just this
    * codec PLUS the factory's built-in fallback scan of default codecs
    * (CompressionCodecFactory keeps extension mappings for all codecs
    * named in the key and, when the key is unset, its defaults — so we
    * preserve defaults by appending, never replacing). */
  def register(conf: Configuration): Unit = {
    val key = "io.compression.codecs"
    val cls = classOf[ZstdJniCodec].getName
    val cur = conf.getTrimmedStrings(key)
    if (!cur.contains(cls)) {
      // when unset, re-seed with the factory's defaults first so adding
      // ours does not REMOVE gzip/bzip2/etc. from the factory's map
      val base =
        if (cur.isEmpty)
          org.apache.hadoop.io.compress.CompressionCodecFactory
            .getCodecClasses(new Configuration(false))
            .toArray.map(_.asInstanceOf[Class[_]].getName)
        else cur
      conf.setStrings(key, (base :+ cls): _*)
    }
  }
}
