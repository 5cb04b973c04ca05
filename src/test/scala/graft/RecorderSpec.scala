package graft

import graft.replay.Replay

/** ST6 recording lifecycle (reference replay_ops.rs:24-210). */
class RecorderSpec extends SparkSpec {

  test("one active session at a time; end requires an active session") {
    val rec = new Replay.Recorder()
    assert(!rec.isRecording)
    val id = rec.startSession("a")
    assert(rec.isRecording && rec.activeSessionId.contains(id))
    intercept[IllegalArgumentException](rec.startSession("b"))
    rec.endSession()
    assert(!rec.isRecording)
    intercept[IllegalStateException](rec.endSession())
    intercept[IllegalStateException](rec.createCheckpoint(0L, 0L))
  }

  test("auto-checkpoint: the checkpoint action counts toward the next interval") {
    val rec = new Replay.Recorder()
    rec.startSession("ingest", autoCheckpointInterval = 3)
    (0 until 7).foreach(i => rec.recordPut(i.toLong, i + 1L, i.toLong))
    val s = rec.endSession()
    // puts at seq 0,1,2 -> cp action seq 3 (counts toward next interval),
    // puts 4,5 -> cp 6, puts 7,8 -> cp 9: every 2 puts after the first 3
    assert(s.actionCount == 10) // 7 puts + 3 checkpoints
    assert(s.checkpointCount == 3)
    val cps = rec.checkpointsDF(spark).collect()
      .map(r => (r.getAs[Long]("checkpointId"), r.getAs[Long]("atSequence")))
      .sortBy(_._1)
    assert(cps.toSeq == Seq((0L, 2L), (1L, 5L), (2L, 8L)))
  }

  test("record is a no-op with no active session; recording resumes cleanly") {
    val rec = new Replay.Recorder()
    rec.recordPut(9L, 1L, 0L) // reference record_* guards on active_session
    rec.recordFind("q", "lex", Seq(1L))
    val id1 = rec.startSession("s1")
    rec.recordFind("q", "lex", Seq(1L, 2L))
    rec.endSession()
    val id2 = rec.startSession("s2")
    assert(id1 != id2)
    rec.recordAsk("q", "p", "m", 10L, Seq.empty)
    val s2 = rec.endSession()
    assert(s2.actionCount == 1)
    assert(rec.listSessions.map(_.actionCount) == Seq(1L, 1L))
  }

  test("injected clock: created/ended/duration and per-action ts are exact") {
    val rec = new Replay.Recorder()
    rec.startSession("s") // tick 1
    rec.recordFind("a", "lex", Seq.empty) // tick 2
    rec.recordFind("b", "lex", Seq.empty) // tick 3
    val s = rec.endSession() // tick 4
    assert(s.createdSecs == 1 && s.endedSecs == 4 && s.durationSecs == 3)
    val ts = rec.actionsDF(spark).collect()
      .map(r => r.getAs[Long]("tsSecs")).sorted
    assert(ts.toSeq == Seq(2L, 3L))
  }
}
