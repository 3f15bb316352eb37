package graft

/** Mechanical run of update_queries.go `OnUpdateExprScripts` (15 blocks):
  * ON UPDATE CURRENT_TIMESTAMP[(p)] column option — declaration errors
  * (ErrInvalidOnUpdate on non-temporal columns / mismatched precision /
  * general expressions), auto-set on CHANGED rows only (dolt issue
  * 10657), explicit assignment suppression, SHOW CREATE rendering. The
  * reference freezes the clock per phase (enginetests.go:5228:
  * setup = Jan1Noon, assertions = Dec15_1_30) via sql.RunWithNowFunc —
  * mirrored through Engine.queryNow.
  */
class ReferenceOnUpdateCorpusSpec extends GoScriptCorpusSpec {
  val path = "/root/reference/enginetest/queries/update_queries.go"
  val varNames = Seq("OnUpdateExprScripts")
  override def beforeSetup(engine: Engine): Unit =
    engine.queryNow = Some(java.sql.Timestamp.valueOf("2000-01-01 12:00:00"))
  override def beforeAsserts(engine: Engine): Unit =
    engine.queryNow = Some(java.sql.Timestamp.valueOf("2023-12-15 01:30:00"))
  override val divergences = Map(
    // zero dates (DEFAULT 0 on a timestamp) store as NULL here — the
    // ZeroTime read-backs are a documented type-layer divergence
    "select * from t order by i;" -> "zero dates read back NULL",
    "select * from child;" -> "zero dates read back NULL",
    "select * from test" -> "zero dates read back NULL")
  override val blockDivergences = Map(
    // triggers / stored procedures are agreed-descoped OLTP surface
    // (SURVEY §2.12)
    "before update trigger" -> "CREATE TRIGGER (descoped §2.12)",
    "after update trigger" -> "CREATE TRIGGER (descoped §2.12)",
    "insert triggers" -> "CREATE TRIGGER (descoped §2.12)",
    "stored procedure tests" -> "CREATE PROCEDURE (descoped §2.12)")
  registerAll()
}
