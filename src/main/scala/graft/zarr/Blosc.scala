package graft.zarr

import java.nio.{ByteBuffer, ByteOrder}

/** Blosc1 chunk frame codec — the compressor zarr-python writes BY DEFAULT
  * for v2 stores (numcodecs `Blosc(cname='lz4', clevel=5, shuffle=SHUFFLE)`),
  * so real-world community anndata/zarr stores are overwhelmingly
  * blosc-framed. Implemented from the public c-blosc container format
  * (BLOSC format README / blosc.h, stable since blosc 1.0):
  *
  * {{{
  * byte 0      version (format version, 2)
  * byte 1      versionlz (inner codec format version)
  * byte 2      flags: bit0 byte-shuffle, bit1 pure-memcpy, bit2 bit-shuffle,
  *             bits 5-7 inner codec (0 blosclz, 1 lz4/lz4hc, 2 snappy,
  *             3 zlib, 4 zstd)
  * byte 3      typesize
  * bytes 4-7   nbytes   (uncompressed size, uint32 LE)
  * bytes 8-11  blocksize(uint32 LE)
  * bytes 12-15 cbytes   (total frame size, uint32 LE)
  * }}}
  *
  * then, unless memcpy: one uint32-LE `bstart` offset per block (frame-
  * absolute, pointing at the block's first split), and per block a
  * sequence of splits, each `[int32 cbytes][payload]` — payload raw when
  * split-cbytes == split-size, else inner-codec-compressed. Byte-shuffle
  * operates per block over the elements it holds.
  *
  * Decode accepts any conforming frame (memcpy, 1-or-typesize splits,
  * multi-block, leftover last block; byte-shuffle or bit-shuffle; inner
  * codecs lz4 / zlib / snappy / zstd — all already on Spark's classpath —
  * plus blosclz re-implemented below from its public stream format).
  * The number of splits per block is not recorded in the
  * frame — c-blosc recomputes it from a version-dependent heuristic — so
  * the decoder tries the two legal values (typesize, then 1) and accepts
  * the parse that consumes the block's exact compressed extent while
  * producing its exact decompressed size; a coincidental false match on
  * BOTH structure checks across ALL blocks is not realistic.
  *
  * Encode writes the simplest conforming frame: single block, single
  * split, byte-shuffle + LZ4 level-1 — readable by any c-blosc since 1.0
  * and by zarr-python/numcodecs as-is.
  */
object Blosc {

  private val MemcpyFlag = 0x2
  private val ByteShuffleFlag = 0x1
  private val BitShuffleFlag = 0x4

  @transient private lazy val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance()

  /** Byte shuffle: group byte-lane k of every element together
    * (out[k*n + e] = in[e*T + k]). Only the leading (len/T)*T bytes
    * shuffle; the tail (never present for whole-element buffers) copies. */
  private[graft] def shuffle(in: Array[Byte], typesize: Int): Array[Byte] = {
    if (typesize <= 1) return in
    val n = in.length / typesize
    val out = new Array[Byte](in.length)
    var k = 0
    while (k < typesize) {
      var e = 0
      while (e < n) { out(k * n + e) = in(e * typesize + k); e += 1 }
      k += 1
    }
    var t = n * typesize
    while (t < in.length) { out(t) = in(t); t += 1 }
    out
  }

  private[graft] def unshuffle(in: Array[Byte], typesize: Int): Array[Byte] = {
    if (typesize <= 1) return in
    val n = in.length / typesize
    val out = new Array[Byte](in.length)
    var k = 0
    while (k < typesize) {
      var e = 0
      while (e < n) { out(e * typesize + k) = in(k * n + e); e += 1 }
      k += 1
    }
    var t = n * typesize
    while (t < in.length) { out(t) = in(t); t += 1 }
    out
  }

  /** Build the frame around an already-shuffled byte image: LZ4 level-1,
    * single block, single split, raw-split fallback when LZ4 does not
    * shrink. Shared by [[compress]] and the fused 8-byte encoders so the
    * wire format cannot diverge between them. */
  private def frameOf(shuffled: Array[Byte], typesize: Int,
                      doShuffle: Boolean): Array[Byte] = {
    val comp = lz4.fastCompressor()
    val maxLen = comp.maxCompressedLength(shuffled.length)
    val tmp = new Array[Byte](maxLen)
    val cLen = comp.compress(shuffled, 0, shuffled.length, tmp, 0, maxLen)
    val (payload, payloadLen) =
      if (cLen < shuffled.length) (tmp, cLen) else (shuffled, shuffled.length)
    // header(16) + bstarts(4, one block) + [int32 split-cbytes][payload]
    val frame = ByteBuffer.allocate(16 + 4 + 4 + payloadLen).order(ByteOrder.LITTLE_ENDIAN)
    val flags = (if (doShuffle) ByteShuffleFlag else 0) | (1 << 5) // lz4
    frame.put(2.toByte).put(1.toByte).put(flags.toByte).put(typesize.toByte)
    frame.putInt(shuffled.length) // nbytes (shuffle preserves length)
    frame.putInt(shuffled.length) // blocksize = nbytes (single block)
    frame.putInt(16 + 4 + 4 + payloadLen) // cbytes
    frame.putInt(20)              // bstart of block 0
    frame.putInt(payloadLen)      // split cbytes (== size → raw convention)
    frame.put(payload, 0, payloadLen)
    frame.array()
  }

  /** Encode `raw` as a blosc(lz4, byte-shuffle) frame: one block (blocksize
    * = nbytes), one split. Falls back to the raw-split convention when LZ4
    * does not shrink the (shuffled) bytes. */
  def compress(raw: Array[Byte], typesize: Int): Array[Byte] = {
    require(typesize >= 1 && typesize <= 255, s"blosc typesize $typesize out of range")
    require(raw.length <= Int.MaxValue - 64, "blosc frame limited to < 2 GiB")
    val doShuffle = typesize > 1 && raw.length % typesize == 0
    frameOf(if (doShuffle) shuffle(raw, typesize) else raw, typesize, doShuffle)
  }

  /** FUSED 8-byte-element encode (r21, guide §1.2 per-task work): the
    * byte-shuffle lanes are written straight from the double buffer —
    * `bits` maps an element to the exact 8 bytes the row-major dtype image
    * would hold (little-endian) — so the intermediate row-major byte image
    * of [[graft.zarr.Zarr.encodeChunk]] + the separate [[shuffle]] pass
    * never materialize: two passes/allocations instead of four per chunk.
    * Frames are byte-identical to `compress(image, 8)` (same shuffle
    * image, same LZ4 call, same header/fallback via [[frameOf]]) —
    * differential-pinned in ZarrSpec. */
  def compress8(buf: Array[Double], bits: Double => Long): Array[Byte] = {
    require(buf.length <= (Int.MaxValue - 64) / 8, "blosc frame limited to < 2 GiB")
    val n = buf.length
    val shuffled = new Array[Byte](n * 8)
    var k = 0
    while (k < 8) {
      val base = k * n
      val sh = 8 * k
      var e = 0
      while (e < n) {
        shuffled(base + e) = ((bits(buf(e)) >>> sh) & 0xFFL).toByte
        e += 1
      }
      k += 1
    }
    frameOf(shuffled, 8, doShuffle = true)
  }

  /** Hard ceiling on a self-sized allocation: no legitimate vlen-string
    * chunk approaches this, and it stops a corrupt/hostile header's
    * claimed nbytes from forcing a ~2 GiB allocation before any
    * structural validation runs. */
  private val MaxSelfSizedBytes = 256 << 20

  /** Decode a frame whose uncompressed size is NOT derivable from store
    * geometry (vlen string chunks): trust the header's own nbytes, but
    * sanity-cap it (absolute cap + a generous 1024× ratio vs the frame)
    * before allocating. */
  def decompressSelfSized(frame: Array[Byte]): Array[Byte] = {
    require(frame.length >= 16, s"blosc frame truncated: ${frame.length} bytes")
    val nbytes = ByteBuffer.wrap(frame, 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(nbytes >= 0, s"blosc header nbytes $nbytes invalid")
    require(nbytes <= MaxSelfSizedBytes && nbytes.toLong <= frame.length.toLong * 1024,
      s"blosc header nbytes $nbytes implausible for a ${frame.length}-byte frame")
    decompress(frame, nbytes)
  }

  /** Decode one blosc frame; `expectedNBytes` cross-checks the store
    * geometry (chunk shape × dtype) against the self-describing header. */
  def decompress(frame: Array[Byte], expectedNBytes: Int): Array[Byte] = {
    require(frame.length >= 16, s"blosc frame truncated: ${frame.length} bytes")
    val hdr = ByteBuffer.wrap(frame, 0, 16).order(ByteOrder.LITTLE_ENDIAN)
    hdr.get() // version
    hdr.get() // versionlz
    val flags = hdr.get() & 0xFF
    val typesize = hdr.get() & 0xFF
    val nbytes = hdr.getInt
    val blocksize = hdr.getInt
    val cbytes = hdr.getInt
    require(nbytes == expectedNBytes,
      s"blosc nbytes $nbytes != expected $expectedNBytes (chunk shape × dtype mismatch)")
    require(cbytes == frame.length,
      s"blosc cbytes $cbytes != frame length ${frame.length} (truncated chunk file)")
    if ((flags & MemcpyFlag) != 0) {
      require(frame.length >= 16 + nbytes, "blosc memcpy frame truncated")
      return java.util.Arrays.copyOfRange(frame, 16, 16 + nbytes)
    }
    val codec = (flags >> 5) & 0x7
    // reject unknown codecs HERE, loudly — inside the split walker the
    // per-hypothesis try/catch would fold the real cause into a generic
    // does-not-parse error
    codec match {
      case 0 | 1 | 2 | 3 | 4 => ()
      case other => throw new IllegalArgumentException(s"unknown blosc codec id $other")
    }
    require(blocksize > 0, s"blosc blocksize $blocksize invalid")
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val bb = ByteBuffer.wrap(frame, 16, 4 * nblocks).order(ByteOrder.LITTLE_ENDIAN)
    val bstarts = Array.fill(nblocks)(bb.getInt)
    // MULTITHREADED c-blosc appends blocks in thread-COMPLETION order, so
    // bstarts are not monotonic — but blocks are still CONTIGUOUS wherever
    // they landed, so each block's compressed extent is the gap to the
    // next-LARGER bstart (frame end for the last). Keeping the exact-
    // extent check matters: it is the discriminator between the typesize-
    // and 1-split hypotheses (a wrong hypothesis that happens to parse
    // structurally still consumes the wrong byte count).
    val sortedStarts = bstarts.sorted
    def extentOf(start: Int): Int = {
      val ix = java.util.Arrays.binarySearch(sortedStarts, start)
      require(ix >= 0, s"blosc bstart $start missing from sorted starts")
      (if (ix + 1 < sortedStarts.length) sortedStarts(ix + 1) else cbytes) - start
    }
    val out = new Array[Byte](nbytes)
    var b = 0
    while (b < nblocks) {
      val bsize = math.min(blocksize, nbytes - b * blocksize) // leftover last
      val block = new Array[Byte](bsize)
      // splits per block are NOT in the frame: try typesize splits (what
      // c-blosc writes for fast codecs — version-dependent heuristic,
      // shuffle not required), then 1
      val candidates =
        if (typesize > 1 && bsize % typesize == 0) Seq(typesize, 1) else Seq(1)
      val extent = extentOf(bstarts(b))
      val ok = candidates.exists(ns => tryDecodeBlock(frame, bstarts(b), extent,
        block, ns, codec))
      if (!ok) throw new IllegalArgumentException(
        s"blosc block $b does not parse with ${candidates.mkString("/")} splits " +
          s"(codec $codec, bstart ${bstarts(b)}, extent $extent, bsize $bsize)")
      val plain =
        if ((flags & ByteShuffleFlag) != 0) unshuffle(block, typesize)
        else if ((flags & BitShuffleFlag) != 0) bitunshuffle(block, typesize)
        else block
      System.arraycopy(plain, 0, out, b * blocksize, bsize)
      b += 1
    }
    out
  }

  /** Attempt to parse one block as `nsplits` equal splits; true iff the
    * parse consumes exactly `extent` compressed bytes and fills `block`.
    * The exact-consumption check is what rejects a structurally-plausible
    * parse under the WRONG split-count hypothesis. */
  private def tryDecodeBlock(frame: Array[Byte], start: Int, extent: Int,
                             block: Array[Byte], nsplits: Int, codec: Int): Boolean = {
    if (block.length % nsplits != 0) return false
    if (start < 16 || start + extent > frame.length) return false
    val neblock = block.length / nsplits
    var pos = start
    var outPos = 0
    var s = 0
    try {
      while (s < nsplits) {
        if (pos + 4 > start + extent) return false
        val c = ByteBuffer.wrap(frame, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
        pos += 4
        if (c < 0 || pos + c > start + extent) return false
        if (c == neblock) { // raw split
          System.arraycopy(frame, pos, block, outPos, neblock)
        } else {
          val n = inflateSplit(frame, pos, c, block, outPos, neblock, codec)
          if (n != neblock) return false
        }
        pos += c
        outPos += neblock
        s += 1
      }
      pos - start == extent && outPos == block.length
    } catch {
      case _: Exception => false // corrupt under this split hypothesis
    }
  }

  /** One split through the inner codec. Returns decompressed length. */
  private def inflateSplit(src: Array[Byte], off: Int, len: Int,
                           dst: Array[Byte], dstOff: Int, maxOut: Int,
                           codec: Int): Int = codec match {
    case 1 => // lz4 / lz4hc (same block format)
      lz4.safeDecompressor().decompress(src, off, len, dst, dstOff, maxOut)
    case 3 => // zlib (standard zlib stream per split)
      // finally: tryDecodeBlock drives this path with wrong-hypothesis
      // (often throwing) parses — without end() each failure leaks the
      // Inflater's native memory until finalization
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(src, off, len)
        var out = 0
        while (out < maxOut && !inf.finished()) {
          val n = inf.inflate(dst, dstOff + out, maxOut - out)
          if (n == 0 && !inf.finished()) throw new IllegalArgumentException("zlib stall")
          out += n
        }
        out
      } finally inf.end()
    case 2 => // snappy raw block
      val tmp = org.xerial.snappy.Snappy.uncompress(
        java.util.Arrays.copyOfRange(src, off, off + len))
      System.arraycopy(tmp, 0, dst, dstOff, math.min(tmp.length, maxOut))
      tmp.length
    case 4 => // zstd
      val tmp = new Array[Byte](maxOut)
      val n = com.github.luben.zstd.Zstd.decompressByteArray(
        tmp, 0, maxOut, src, off, len)
      System.arraycopy(tmp, 0, dst, dstOff, n.toInt)
      n.toInt
    case 0 => // blosclz
      blosclzDecompress(src, off, len, dst, dstOff, maxOut)
    case other => throw new IllegalArgumentException(s"unknown blosc codec id $other")
  }

  // ---------------------------------------------------------------- blosclz

  private val MaxDistance = 8191 // blosclz/FastLZ near-match window

  /** blosclz decompressor (c-blosc's native default codec, stream format
    * version 1 — a FastLZ-derived LZ77), re-implemented from the public
    * stream format: a control-byte stream where ctrl < 32 emits ctrl+1
    * literal bytes, and ctrl >= 32 a match of length (ctrl>>5)+2 — a
    * length field of 7 adds 255-terminated extension bytes — at distance
    * ((ctrl&31)<<8)+code+1, where code is the next byte; code == 255 with
    * a maxed offset field switches to a far match with an explicit
    * big-endian 16-bit distance + 8192. The first control byte masks to
    * its low 5 bits (always a literal run). Distance 1 against the byte
    * just written is a run (RLE). Returns the decompressed length. */
  private[graft] def blosclzDecompress(src: Array[Byte], off: Int, len: Int,
                                       dst: Array[Byte], dstOff: Int, maxOut: Int): Int = {
    val ipEnd = off + len
    var ip = off
    def nextByte(): Int = {
      if (ip >= ipEnd) throw new IllegalArgumentException("blosclz stream truncated")
      val v = src(ip) & 0xFF; ip += 1; v
    }
    var op = dstOff
    val opEnd = dstOff + maxOut
    var ctrl = nextByte() & 31
    var loop = true
    while (loop) {
      if (ctrl >= 32) {
        var mlen = (ctrl >> 5) - 1
        val ofs = (ctrl & 31) << 8
        var ref = op - ofs
        if (mlen == 6) { // maxed length field: 255-terminated extensions
          var code = 0
          do { code = nextByte(); mlen += code } while (code == 255)
        }
        val code = nextByte()
        ref -= code
        if (code == 255 && ofs == (31 << 8)) { // far match, explicit distance
          val far = (nextByte() << 8) + nextByte()
          ref = op - far - MaxDistance
        }
        if (ip < ipEnd) ctrl = nextByte() else loop = false
        val total = mlen + 3
        if (op + total > opEnd)
          throw new IllegalArgumentException("blosclz output overruns expected size")
        if (ref == op) { // distance-1 run of the previous byte
          if (op - 1 < dstOff) throw new IllegalArgumentException("blosclz run before start")
          java.util.Arrays.fill(dst, op, op + total, dst(op - 1))
          op += total
        } else {
          ref -= 1 // stored distance is actual-1
          if (ref < dstOff) throw new IllegalArgumentException("blosclz match before start")
          var i = 0 // byte-by-byte: matches may overlap their own output
          while (i < total) { dst(op) = dst(ref); op += 1; ref += 1; i += 1 }
        }
      } else {
        val n = ctrl + 1
        if (op + n > opEnd)
          throw new IllegalArgumentException("blosclz output overruns expected size")
        if (ip + n > ipEnd) throw new IllegalArgumentException("blosclz stream truncated")
        System.arraycopy(src, ip, dst, op, n); ip += n; op += n
        if (ip < ipEnd) ctrl = nextByte() else loop = false
      }
    }
    op - dstOff
  }

  // ------------------------------------------------------------ bit-shuffle

  /** 8×8 bit-matrix transpose of a 64-bit word (rows = bytes, bit j of
    * byte i ↔ bit i of byte j) — the standard three-round mask-and-swap
    * network; involutive, so the same function serves both directions. */
  private def transpose8x8(x0: Long): Long = {
    var x = x0
    var t = (x ^ (x >>> 7)) & 0x00AA00AA00AA00AAL
    x = x ^ t ^ (t << 7)
    t = (x ^ (x >>> 14)) & 0x0000CCCC0000CCCCL
    x = x ^ t ^ (t << 14)
    t = (x ^ (x >>> 28)) & 0x00000000F0F0F0F0L
    x = x ^ t ^ (t << 28)
    x
  }

  /** c-blosc bit-shuffle of one block (bitshuffle-library semantics):
    * the leading m = (len/T − (len/T)%8) elements, viewed as an
    * (elements × bits-per-element) bit matrix, are TRANSPOSED — output
    * bit-plane b (b = 8·bytelane + bit-in-byte, i.e. memory bit order,
    * LSB first) is m/8 contiguous bytes holding bit b of every element,
    * packed by element index LSB-first. Tail bytes (elements beyond the
    * multiple of 8, plus any sub-element remainder) copy verbatim.
    * Implemented as the public algorithm's three scalar stages —
    * byte-lane transpose; 8×8 bit transpose per byte-group scattered to
    * 8 global bit-rows; plane permutation from (bit, lane) to memory
    * bit order — and pinned in tests against an independent naive
    * bit-matrix-transpose definition. */
  private[graft] def bitshuffle(in: Array[Byte], typesize: Int): Array[Byte] = {
    val t = math.max(typesize, 1)
    val m = { val n0 = in.length / t; n0 - (n0 % 8) }
    val body = m * t
    val out = new Array[Byte](in.length)
    if (body > 0) {
      val a = new Array[Byte](body) // stage 1: byte-lane transpose
      var k = 0
      while (k < t) {
        var e = 0
        while (e < m) { a(k * m + e) = in(e * t + k); e += 1 }
        k += 1
      }
      val rowLen = body / 8 // stage 2: global bit-rows (bit kk of every byte)
      val b = new Array[Byte](body)
      var ii = 0
      while (ii < body) {
        var x = 0L
        var p = 0
        while (p < 8) { x |= (a(ii + p) & 0xFFL) << (8 * p); p += 1 }
        x = transpose8x8(x)
        var kk = 0
        while (kk < 8) { b(kk * rowLen + (ii >> 3)) = (x >>> (8 * kk)).toByte; kk += 1 }
        ii += 8
      }
      // stage 3: bit-row kk of stage 2 holds lane k's plane at offset
      // k·(m/8); emit planes in element memory-bit order b = 8k + kk
      val r = m / 8
      k = 0
      while (k < t) {
        var kk = 0
        while (kk < 8) {
          System.arraycopy(b, kk * (t * r) + k * r, out, (8 * k + kk) * r, r)
          kk += 1
        }
        k += 1
      }
    }
    System.arraycopy(in, body, out, body, in.length - body)
    out
  }

  /** Inverse of [[bitshuffle]]: the three stages inverted in reverse order. */
  private[graft] def bitunshuffle(in: Array[Byte], typesize: Int): Array[Byte] = {
    val t = math.max(typesize, 1)
    val m = { val n0 = in.length / t; n0 - (n0 % 8) }
    val body = m * t
    val out = new Array[Byte](in.length)
    if (body > 0) {
      val r = m / 8
      val b = new Array[Byte](body) // stage 3 inverse: planes back to bit-rows
      var k = 0
      while (k < t) {
        var kk = 0
        while (kk < 8) {
          System.arraycopy(in, (8 * k + kk) * r, b, kk * (t * r) + k * r, r)
          kk += 1
        }
        k += 1
      }
      val rowLen = body / 8 // stage 2 inverse (transpose8x8 is involutive)
      val a = new Array[Byte](body)
      var ii = 0
      while (ii < body) {
        var x = 0L
        var kk = 0
        while (kk < 8) { x |= (b(kk * rowLen + (ii >> 3)) & 0xFFL) << (8 * kk); kk += 1 }
        x = transpose8x8(x)
        var p = 0
        while (p < 8) { a(ii + p) = (x >>> (8 * p)).toByte; p += 1 }
        ii += 8
      }
      k = 0 // stage 1 inverse
      while (k < t) {
        var e = 0
        while (e < m) { out(e * t + k) = a(k * m + e); e += 1 }
        k += 1
      }
    }
    System.arraycopy(in, body, out, body, in.length - body)
    out
  }
}
