package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Real audio codec for the multimodal path's AUDIO modality — the
  * [[ImageCodec]] contract applied to sound. The container ships no
  * media libraries, but RIFF/WAVE PCM is a pure-header container: the
  * generator writes a REAL canonical WAV (RIFF magic, fmt chunk,
  * little-endian s16 mono PCM), and [[AudioCodec.decode]] re-parses
  * the container from bytes — magic checks, chunk walk, format
  * validation — before computing sample-level features. PCM is
  * lossless, so the decoded features equal the sample GENERATOR's
  * integer formula, which is what lets a DuckDB oracle grade a binary
  * codec it cannot run: the oracle replays the formula, and any
  * encode/parse/decode divergence fails the hash gate.
  *
  * Features are the classic first-pass audio triple — total energy
  * (Σ s², exact long), peak amplitude, and zero-crossing count (the
  * cheap pitch/noisiness proxy) — all integer-exact.
  */
object AudioCodec {

  /** Decoded-clip record over the real parsed PCM. */
  final case class Meta(nSamples: Int, energy: Long, peak: Int,
      zeroCrossings: Long)

  /** Sample formula — the single source of truth shared by the WAV
    * generator and replayed by the DuckDB oracle: a full-range
    * deterministic s16 signal. The stride is PER-ID (7919 + 2·(id
    * mod 127), always odd so every clip still walks the whole 2¹⁶
    * ring): a constant stride made frame-energy rise patterns nearly
    * id-independent — 99.4 % of clips shared an exact fingerprint
    * family with the frozen split, collapsing the ingest gate's
    * verdict to one side (the r15 dHash x-step finding, audio
    * edition). Any change here must bump the wav_media AND
    * afp_snap_blocks artifact versions and re-verify the mm_audio
    * family at every SF. */
  def sampleValue(id: Long, i: Long): Int =
    (((id * 31L + i * (7919L + 2L * (id % 127L))) % 65536L)
      - 32768L).toInt

  /** Clip length per media id: 512–1536 samples by id residue. */
  def sampleCount(id: Long): Int = ((id % 5 + 2) * 256).toInt

  /** Deterministic tiny WAV for a media id: canonical 44-byte header
    * (PCM format 1, mono, 8 kHz, 16-bit) + little-endian samples. */
  def encodeWav(id: Long): Array[Byte] = {
    val n = sampleCount(id)
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(8000); bb.putInt(16000) // sample rate, byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0
    while (i < n) { bb.putShort(sampleValue(id, i).toShort); i += 1 }
    bb.array()
  }

  /** REAL decode: validate the RIFF/WAVE magics, walk the chunk list
    * to `fmt ` (requiring PCM / mono / 16-bit) and `data`, then scan
    * the s16le samples once. Returns null on unparseable bytes (the
    * permissive-scan convention, like [[ImageCodec.decode]]). */
  /** Shared RIFF/WAVE header walk: validate magics, require
    * PCM/mono/16-bit `fmt `, locate `data`; returns the buffer
    * positioned at the sample section plus the sample count, or null
    * on unparseable bytes. ONE parser for every audio expression
    * ([[decode]], [[fingerprintBoxed]]) — the bandBuckets
    * one-definition discipline at the byte level. */
  private def dataSection(blob: Array[Byte]): (java.nio.ByteBuffer, Int) = {
    if (blob == null || blob.length < 44) return null
    val bb = java.nio.ByteBuffer.wrap(blob)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    try {
      if (tag() != "RIFF") return null
      bb.getInt // declared RIFF payload size (tolerated, not trusted)
      if (tag() != "WAVE") return null
      var fmtOk = false
      var dataOff = -1
      var dataLen = 0
      while (bb.remaining() >= 8 && dataOff < 0) {
        val t = tag()
        val len = bb.getInt
        if (len < 0 || len > bb.remaining()) return null
        if (t == "fmt ") {
          if (len < 16) return null
          val start = bb.position()
          val fmt = bb.getShort; val ch = bb.getShort
          bb.getInt; bb.getInt; bb.getShort
          val bits = bb.getShort
          if (fmt != 1 || ch != 1 || bits != 16) return null
          fmtOk = true
          bb.position(start + len)
        } else if (t == "data") {
          dataOff = bb.position(); dataLen = len
        } else bb.position(bb.position() + len)
      }
      if (!fmtOk || dataOff < 0) return null
      bb.position(dataOff)
      (bb, dataLen / 2)
    } catch { case _: RuntimeException => null }
  }

  def decode(blob: Array[Byte]): Meta = {
    val sec = dataSection(blob)
    if (sec == null) return null
    val (bb, n) = sec
    try {
      var energy = 0L; var peak = 0; var zc = 0L
      var prevNonNeg = false
      var i = 0
      while (i < n) {
        val s = bb.getShort.toInt
        energy += s.toLong * s
        val a = math.abs(s)
        if (a > peak) peak = a
        val nonNeg = s >= 0
        if (i > 0 && nonNeg != prevNonNeg) zc += 1
        prevNonNeg = nonNeg
        i += 1
      }
      Meta(n, energy, peak, zc)
    } catch { case _: RuntimeException => null }
  }

  /** Frame size for [[fingerprintBoxed]]: clips are k·256 samples, so
    * every 64-sample frame is full by construction. */
  val FingerprintFrame = 64

  /** Acoustic fingerprint — the dHash idea in the time domain: frame
    * the REAL parsed PCM into [[FingerprintFrame]]-sample frames,
    * compute exact integer per-frame energies (Σ s²), set bit f iff
    * energy(f+1) > energy(f). Trailing partial frames are ignored
    * (none exist for the generated clips). Null for unparseable
    * bytes; clips shorter than two full frames fingerprint to 0L. */
  def fingerprintBoxed(blob: Array[Byte]): java.lang.Long = {
    val sec = dataSection(blob)
    if (sec == null) return null
    val (bb, n) = sec
    try {
      val nf = n / FingerprintFrame
      var fp = 0L
      var prev = 0L
      var f = 0
      while (f < nf) {
        var e = 0L
        var j = 0
        while (j < FingerprintFrame) {
          val s = bb.getShort.toInt
          e += s.toLong * s
          j += 1
        }
        if (f > 0 && e > prev) fp |= 1L << (f - 1)
        prev = e
        f += 1
      }
      java.lang.Long.valueOf(fp)
    } catch { case _: RuntimeException => null }
  }

  /** Codegen entry point: decode → InternalRow (null-safe). */
  def metaRow(blob: Array[Byte]): InternalRow = {
    val m = decode(blob)
    if (m == null) null
    else InternalRow(m.nSamples, m.energy, m.peak, m.zeroCrossings)
  }
}

/** `graft_audio_meta(blob)` → struct: real RIFF/WAVE parse of a
  * binary column, returning sample count + integer-exact energy /
  * peak / zero-crossing features; null for unparseable bytes.
  * Codegen'd like the other native expressions. */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioMeta.schema
  override def prettyName: String = "graft_audio_meta"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.simpleString}")
  }

  override def nullSafeEval(b: Any): Any =
    AudioCodec.metaRow(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.functions.AudioCodec.metaRow($b);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioMeta {
  val schema: StructType = StructType(Seq(
    StructField("n_samples", IntegerType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false)))
}

/** `graft_audio_fingerprint(blob)` → long: frame-energy acoustic
  * fingerprint over the real parsed PCM ([[AudioCodec.fingerprintBoxed]]
  * — the [[graft.functions.ImageDHash]] idea in the time domain);
  * null for unparseable bytes. Codegen'd. */
case class AudioFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_audio_fingerprint"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.simpleString}")
  }

  override def nullSafeEval(b: Any): Any = {
    val v = AudioCodec.fingerprintBoxed(b.asInstanceOf[Array[Byte]])
    if (v == null) null else v.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      java.lang.Long ${ev.value}$$box = graft.functions.AudioCodec.fingerprintBoxed($b);
      ${ev.isNull} = ${ev.value}$$box == null;
      if (!${ev.isNull}) ${ev.value} = ${ev.value}$$box.longValue();""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
