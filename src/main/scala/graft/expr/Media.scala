package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.{BmpDims, BmpWrap, Pcm16Fingerprint, WavMeta, WavWrap}

/** Column wrappers for the byte-true media fixture/decoder expressions
  * (org.apache.spark.sql.graftshim.BmpWrap / BmpDims). */
object MediaFunctions {
  import graft.Cols

  /** Wrap a binary payload in a real BMP header carrying (w, h). */
  def bmp_wrap(payload: Column, w: Column, h: Column): Column =
    Cols.column(BmpWrap(Cols.expr(payload), Cols.expr(w), Cols.expr(h)))

  /** Parse struct(width, height) from BMP bytes; null for non-BMP. */
  def bmp_dims(content: Column): Column =
    Cols.column(BmpDims(Cols.expr(content)))

  /** Wrap a binary payload in a real 16-bit PCM WAV header. */
  def wav_wrap(payload: Column, sampleRate: Column, channels: Column): Column =
    Cols.column(WavWrap(Cols.expr(payload), Cols.expr(sampleRate), Cols.expr(channels)))

  /** Parse struct(sample_rate, channels, n_samples) from WAV bytes;
    * null for non-WAV. */
  def wav_meta(content: Column): Column =
    Cols.column(WavMeta(Cols.expr(content)))

  /** 16-window PCM16 energy fingerprint of a char-as-byte sample
    * stream: struct(audio_fp, n_samples); null when no complete
    * sample. One codegen pass — no per-sample explode. */
  def pcm16_fp(payload: Column): Column =
    Cols.column(Pcm16Fingerprint(Cols.expr(payload)))
}
