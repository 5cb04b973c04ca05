package graft

/** Compiles a minimal fake `ai.onnxruntime` at test runtime (javax.tools,
  * in-JDK) into a temp dir and serves it through a child URLClassLoader —
  * the app classloader never sees it, so `onnxAvailable` stays false for
  * every other suite while OnnxSessionPathSpec injects the loader and
  * drives the REAL reflective session plumbing end-to-end.
  *
  * The fake model is deterministic: outputs are pure functions of the
  * input tensors, dispatched on the input names the four graft backends
  * use (`input_ids`/`attention_mask`, `mel`, `pixel_values`); embedding
  * width comes from a `dimN` marker in the model path.
  */
object FakeOrt {

  private val sources: Seq[(String, String)] = Seq(
    "OrtEnvironment" ->
      """package ai.onnxruntime;
        |public class OrtEnvironment {
        |  private static final OrtEnvironment ENV = new OrtEnvironment();
        |  public static OrtEnvironment getEnvironment() { return ENV; }
        |  public OrtSession createSession(String modelPath) {
        |    return new OrtSession(modelPath);
        |  }
        |}
        |""".stripMargin,
    "OnnxTensor" ->
      """package ai.onnxruntime;
        |public class OnnxTensor {
        |  public final Object data;
        |  private OnnxTensor(Object d) { data = d; }
        |  public static OnnxTensor createTensor(OrtEnvironment env, Object data) {
        |    return new OnnxTensor(data);
        |  }
        |}
        |""".stripMargin,
    "OnnxValue" ->
      """package ai.onnxruntime;
        |public class OnnxValue {
        |  private final Object v;
        |  public OnnxValue(Object v) { this.v = v; }
        |  public Object getValue() { return v; }
        |}
        |""".stripMargin,
    "OrtResult" ->
      """package ai.onnxruntime;
        |public class OrtResult {
        |  private final OnnxValue v;
        |  public OrtResult(Object o) { v = new OnnxValue(o); }
        |  public OnnxValue get(int i) { return v; }
        |}
        |""".stripMargin,
    "OrtSession" ->
      """package ai.onnxruntime;
        |import java.util.Map;
        |public class OrtSession {
        |  private final String modelPath;
        |  public OrtSession(String p) { modelPath = p; }
        |  public OrtResult run(Map<String, Object> inputs) {
        |    if (modelPath.contains("whisper-encoder")) {
        |      // mel [1][nMels][nFrames] -> audio features [1][T][4]; the
        |      // feature values are a pure function of the mel energies so the
        |      // decoder's scripted logits can depend on the REAL featurization
        |      float[][][] mel = (float[][][]) ((OnnxTensor) inputs.get("mel")).data;
        |      float s = 0f;
        |      for (float[] bin : mel[0]) for (float x : bin) s += x;
        |      int T = Math.max(1, mel[0][0].length / 100);
        |      float[][][] feats = new float[1][T][4];
        |      for (int t = 0; t < T; t++)
        |        for (int j = 0; j < 4; j++) feats[0][t][j] = s + t + j;
        |      return new OrtResult(feats);
        |    }
        |    if (modelPath.contains("whisper-decoder")) {
        |      // tokens [1][seq] + audio_features -> logits [1][seq][vocab].
        |      // Scripted greedy path: a special-region trap at vocab-1 that
        |      // suppression must kill, a favored normal token derived from
        |      // (generated-count, feature signature), EOT favored after 8
        |      // generations; "mode-rep" favors one token forever so the
        |      // repetition brake is reachable.
        |      long[][] toks = (long[][]) ((OnnxTensor) inputs.get("tokens")).data;
        |      float[][][] feats =
        |        (float[][][]) ((OnnxTensor) inputs.get("audio_features")).data;
        |      int vocab = markerOf(modelPath, "vocab", 100);
        |      int eot = markerOf(modelPath, "eot", 89);
        |      int seq = toks[0].length;
        |      int gen = seq - 3;                       // prompt length is 3
        |      int sig = (int) (Math.abs(feats[0][0][0]) % 7);
        |      float[][][] logits = new float[1][seq][vocab];
        |      float[] last = logits[0][seq - 1];
        |      last[vocab - 1] = 50f;                   // special trap
        |      if (modelPath.contains("mode-rep")) last[42] = 10f;
        |      else {
        |        last[10 + ((gen * 7 + sig) % 30)] = 10f;
        |        if (gen >= 8) last[eot] = 20f;
        |      }
        |      return new OrtResult(logits);
        |    }
        |    if (inputs.containsKey("mel")) {
        |      float[][][] mel = (float[][][]) ((OnnxTensor) inputs.get("mel")).data;
        |      long h = 17;
        |      for (float x : mel[0][0]) h = h * 31 + Float.floatToIntBits(x);
        |      return new OrtResult(
        |        "fakewords[" + mel[0][0].length + "]#" + Long.toHexString(h & 0xffffffffL));
        |    }
        |    if (inputs.containsKey("pixel_values")) {
        |      float[][] px = (float[][]) ((OnnxTensor) inputs.get("pixel_values")).data;
        |      int dim = dimOf(modelPath);
        |      float[][] out = new float[px.length][dim];
        |      for (int b = 0; b < px.length; b++) {
        |        float s = 0f;
        |        for (float x : px[b]) s += x;
        |        for (int j = 0; j < dim; j++) out[b][j] = s + j;
        |      }
        |      return new OrtResult(out);
        |    }
        |    long[][] ids = (long[][]) ((OnnxTensor) inputs.get("input_ids")).data;
        |    int dim = dimOf(modelPath);
        |    float[][][] out = new float[ids.length][][];
        |    for (int b = 0; b < ids.length; b++) {
        |      out[b] = new float[ids[b].length][dim];
        |      for (int t = 0; t < ids[b].length; t++)
        |        for (int j = 0; j < dim; j++)
        |          out[b][t][j] = ((ids[b][t] % 97) + j) / 100.0f;
        |    }
        |    return new OrtResult(out);
        |  }
        |  private static int dimOf(String path) {
        |    return markerOf(path, "dim", 4);
        |  }
        |  private static int markerOf(String path, String marker, int dflt) {
        |    java.util.regex.Matcher m =
        |      java.util.regex.Pattern.compile(marker + "(\\d+)").matcher(path);
        |    return m.find() ? Integer.parseInt(m.group(1)) : dflt;
        |  }
        |}
        |""".stripMargin)

  lazy val loader: ClassLoader = {
    val dir = java.nio.file.Files.createTempDirectory("fake-ort")
    val pkg = dir.resolve("ai").resolve("onnxruntime")
    java.nio.file.Files.createDirectories(pkg)
    val files = sources.map { case (name, src) =>
      val f = pkg.resolve(name + ".java")
      java.nio.file.Files.writeString(f, src)
      f.toString
    }
    val compiler = javax.tools.ToolProvider.getSystemJavaCompiler
    val rc = compiler.run(null, null, null, (files :+ "-d" :+ dir.toString): _*)
    require(rc == 0, "fake ONNX runtime failed to compile")
    new java.net.URLClassLoader(Array(dir.toUri.toURL), getClass.getClassLoader)
  }

  /** run `f` with the fake runtime visible to the reflection guard */
  def withLoader[A](f: => A): A = {
    val prev = graft.ask.TextInference.runtimeLoader
    graft.ask.TextInference.runtimeLoader = loader
    try f finally graft.ask.TextInference.runtimeLoader = prev
  }
}
