package graft.multimodal

/** Log-mel spectrogram featurizer, pure Scala (reference: whisper.rs mel
  * stage — Whisper consumes 80-bin log-mels over 25 ms windows at 10 ms
  * hops on 16 kHz mono). Radix-2 FFT + Hann window + HTK mel filterbank;
  * deterministic, no native code, runs inside executor tasks.
  *
  * This is the real featurization the model stage consumes — only the
  * ONNX session behind it is environment-gated.
  */
object MelSpectrogram {

  final case class Config(sampleRate: Int = 16000, nFft: Int = 512,
                          hop: Int = 160, nMels: Int = 80,
                          fMin: Double = 0.0, fMax: Double = 8000.0)

  /** in-place iterative radix-2 Cooley-Tukey; re/im length must be 2^k */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"fft size must be a power of two, got $n")
    // bit reversal
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr0 = re(base + k + len / 2); val vi0 = im(base + k + len / 2)
          val vr = vr0 * cr - vi0 * ci
          val vi = vr0 * ci + vi0 * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  private def hzToMel(f: Double): Double = 2595.0 * math.log10(1.0 + f / 700.0)
  private def melToHz(m: Double): Double = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)

  /** triangular mel filterbank: nMels rows over nFft/2+1 spectrum bins */
  def filterbank(cfg: Config): Array[Array[Double]] = {
    val nBins = cfg.nFft / 2 + 1
    val melLo = hzToMel(cfg.fMin)
    val melHi = hzToMel(math.min(cfg.fMax, cfg.sampleRate / 2.0))
    val centers = Array.tabulate(cfg.nMels + 2)(i =>
      melToHz(melLo + (melHi - melLo) * i / (cfg.nMels + 1)))
    val binHz = cfg.sampleRate.toDouble / cfg.nFft
    Array.tabulate(cfg.nMels) { m =>
      val (lo, c, hi) = (centers(m), centers(m + 1), centers(m + 2))
      Array.tabulate(nBins) { b =>
        val f = b * binHz
        if (f <= lo || f >= hi) 0.0
        else if (f <= c) (f - lo) / (c - lo)
        else (hi - f) / (hi - c)
      }
    }
  }

  /** samples → frames × nMels log-mel matrix (natural log, floored at 1e-10,
    * Whisper's dynamic-range convention: clamp to max − 8, scale /4 left to
    * the model stage) */
  def logMel(samples: Array[Float], cfg: Config = Config()): Array[Array[Float]] = {
    val fb = filterbank(cfg)
    val nBins = cfg.nFft / 2 + 1
    val window = Array.tabulate(cfg.nFft)(i =>
      0.5 - 0.5 * math.cos(2.0 * math.Pi * i / cfg.nFft))
    val nFrames = math.max(0, (samples.length - cfg.nFft) / cfg.hop + 1)
    val out = new Array[Array[Float]](nFrames)
    val re = new Array[Double](cfg.nFft)
    val im = new Array[Double](cfg.nFft)
    var f = 0
    while (f < nFrames) {
      val start = f * cfg.hop
      var i = 0
      while (i < cfg.nFft) {
        re(i) = samples(start + i) * window(i)
        im(i) = 0.0
        i += 1
      }
      fft(re, im)
      val power = new Array[Double](nBins)
      i = 0
      while (i < nBins) { power(i) = re(i) * re(i) + im(i) * im(i); i += 1 }
      val mel = new Array[Float](cfg.nMels)
      var m = 0
      while (m < cfg.nMels) {
        var acc = 0.0
        val row = fb(m)
        i = 0
        while (i < nBins) { acc += row(i) * power(i); i += 1 }
        mel(m) = math.log(math.max(acc, 1e-10)).toFloat
        m += 1
      }
      out(f) = mel
      f += 1
    }
    out
  }
}
