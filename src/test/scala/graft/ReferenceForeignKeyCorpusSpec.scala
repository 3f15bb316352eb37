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
  override val divergences = Map(
    // REPLACE executes delete+insert per ROW in MySQL, so a row inserted
    // earlier in the batch can be cascade-affected by a later row's
    // delete phase; this engine's REPLACE is batch-wise (delete all
    // keys, insert all rows), which cannot observe mid-batch cascades
    "REPLACE INTO parent VALUES (1, 1, 2), (2, 2, 1)" ->
      "row-ordered REPLACE cascade (batch REPLACE here)",
    "REPLACE INTO parent VALUES (1,1,2), (2,2,1)" ->
      "row-ordered REPLACE cascade (batch REPLACE here)",
    // INT UNSIGNED maps onto Spark's LongType, which renders (and
    // type-compares) as bigint — the unsigned/bigint distinction is a
    // documented type-layer divergence
    "ALTER TABLE parent1 MODIFY v1 BIGINT" ->
      "INT UNSIGNED = LongType = bigint here",
    "ALTER TABLE child1 MODIFY v1 BIGINT" ->
      "INT UNSIGNED = LongType = bigint here",
    // declared BINARY/VARBINARY lengths aren't tracked on BinaryType, so
    // a shortening MODIFY can't be distinguished from a lengthening one
    "MODIFY v1 BINARY(10)" -> "binary column lengths untracked",
    "MODIFY v1 VARBINARY(10)" -> "binary column lengths untracked",
    // information_schema ORDER BY sorts binary here; MySQL's info-schema
    // collation is case-insensitive, so 'fk1' < 'PRIMARY'
    "WHERE TABLE_NAME='parent2' ORDER BY INDEX_NAME" ->
      "binary vs ci ORDER BY collation on info-schema strings",
    // BINARY(n) values store unpadded here; MySQL zero-pads to n, so a
    // parent 'abc\0...' never equals a child 'abc'
    "insert into child_binary_1 values ('abc')" ->
      "BINARY(n) zero-padding semantics")

  override val blockDivergences = Map(
    // MySQL's REPLACE is row-ordered delete+insert: a row inserted early
    // in the batch is cascade-affected by a later row's delete phase.
    // This engine's REPLACE is batch-wise, so the whole block's state
    // diverges after the first REPLACE.
    "Self-referential child column follows parent SET NULL" ->
      "row-ordered REPLACE cascade semantics (batch REPLACE here)",
    "Self-referential child column follows parent CASCADE" ->
      "row-ordered REPLACE cascade semantics (batch REPLACE here)")

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
