package graft

/** Contract of `mm_audio_au_features` (r14, the r13 verdict's item 6) —
  * the AU container through the JDK's javax.sound codec:
  *  - the decode really goes through AudioSystem (a linked JDK decoder,
  *    the javax.imageio JPEG precedent), not a hand parser;
  *  - PCM is lossless in both containers, so features must equal the
  *    WAV twin's EXACTLY (same [[ops.Wav.samplesOf]] waveform);
  *  - truncated payloads route to quarantine rows, never fail the batch.
  */
class AuSpec extends SparkSpec {

  test("AU synthesize → AudioSystem decode round-trips the exact PCM samples") {
    val src = "the quick brown fox".getBytes("UTF-8")
    for (seed <- Seq(1L, 7L, 1000003L)) {
      val au = ops.Au.synthesize(seed, src)
      // The JDK parser itself accepts the container.
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(au))
      assert(aff.getType == javax.sound.sampled.AudioFileFormat.Type.AU,
        s"AudioSystem sniffed ${aff.getType}, not AU")
      val got = ops.Au.decode(au)
      assert(got.isDefined, "AudioSystem failed to decode the synthesized AU")
      val p = got.get
      assert(p.sampleRate == 8000 && p.channels == 1)
      // Exact sample equality with the shared waveform — lossless.
      assert(java.util.Arrays.equals(
        p.samples.map(_.toInt), ops.Wav.samplesOf(seed, src).map(_.toInt)),
        "decoded AU samples differ from the shared waveform")
      // And with the WAV container's decode of the same waveform.
      val w = ops.Wav.decode(ops.Wav.synthesize(seed, src)).get
      assert(p.samples.toSeq == w.samples.toSeq,
        "cross-container PCM divergence (AU vs WAV)")
    }
    // Truncation → reject, not throw (the quarantine discipline).
    assert(ops.Au.decode(ops.Au.synthesize(5L, src).take(16)).isEmpty)
    assert(ops.Au.decode("not audio at all".getBytes("UTF-8")).isEmpty)
  }

  test("mm_audio_au_features: features equal the WAV twin's, quarantine set exact, deterministic") {
    val au = SparkEntry.queries("mm_audio_au_features")(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val wav = SparkEntry.queries("mm_decode_features")(spark, sf).collect()
      .filter(_.getString(2) == "pcm_wav")
      .map(r => r.getLong(0) -> r).toMap
    assert(au.nonEmpty && wav.nonEmpty, "fixture lost its audio parity")
    assert(au.keySet == wav.keySet,
      "AU op covers a different doc set than the WAV decode path")

    au.foreach { case (id, a) =>
      if (id % 17 == 0) {
        assert(a.getString(2) == "quarantined" && a.getInt(4) == 0,
          s"truncated doc $id not quarantined")
      } else {
        val w = wav(id)
        assert(a.getString(2) == "au_pcm16", s"doc $id status ${a.getString(2)}")
        // sample_rate, n_samples, duration_ms, rms, peak — exact equality
        // with the WAV twin (same PCM, lossless containers).
        assert(a.getInt(3) == w.getInt(3) && a.getInt(4) == w.getInt(4) &&
          a.getDouble(5) == w.getDouble(5) && a.getDouble(6) == w.getDouble(6) &&
          a.getInt(7) == w.getInt(7),
          s"doc $id AU features ${a.toSeq} != WAV ${w.toSeq}")
      }
    }

    val again = SparkEntry.queries("mm_audio_au_features")(spark, sf).collect()
      .map(_.toSeq).toSeq
    assert(again == SparkEntry.queries("mm_audio_au_features")(spark, sf)
      .collect().map(_.toSeq).toSeq, "non-deterministic output")
  }
}
