package graft

/** Mechanical run of enginetest/queries/foreign_key_queries.go —
  * `ForeignKeyTests` (102 blocks), `CreateForeignKeyTests`,
  * `DropForeignKeyTests`: FK DDL (named/unnamed/inline REFERENCES),
  * type/key-count mismatch errors, referential actions (CASCADE /
  * SET NULL / RESTRICT / NO ACTION), self-referential and cyclic
  * cascade depth limits, FOREIGN_KEY_CHECKS toggling, RENAME/DROP
  * interplay, and composite/reordered key matching.
  */
class ReferenceForeignKeyCorpusSpec extends GoScriptCorpusSpec {
  val path = "/root/reference/enginetest/queries/foreign_key_queries.go"
  val varNames =
    Seq("ForeignKeyTests", "CreateForeignKeyTests", "DropForeignKeyTests")
  // harness.Setup fixtures (enginetests.go:3362-3380):
  // ForeignKeyTests ← Parent_childData; Create/Drop ← MytableData
  override def fixturesFor(varName: String): Seq[String] =
    if (varName == "ForeignKeyTests") Seq(
      "CREATE TABLE parent (id INT PRIMARY KEY, v1 INT, v2 INT)",
      "create index v1 on parent (v1)",
      "create index v2 on parent (v2)",
      "CREATE TABLE child (id INT PRIMARY KEY, v1 INT, v2 INT)")
    else Seq(
      "create table mytable (i bigint primary key, s varchar(20) not null comment 'column s')",
      "insert into mytable values (1, 'first row'), (2, 'second row'), (3, 'third row')")
  registerAll()
}
