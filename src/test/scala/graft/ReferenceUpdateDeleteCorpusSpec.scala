package graft

/** Mechanical run of the ScriptTest corpora in
  * enginetest/queries/update_queries.go (`UpdateScriptTests`,
  * `UpdateIgnoreScripts`, `UpdateErrorScripts`) and delete_queries.go
  * (`DeleteErrorTests`), over the reference harness's fixture set
  * (enginetests.go:1359-1394: mytable, floattable, niltable,
  * typestable, pk_tables, othertable, tabletest). The WriteQueryTest
  * vars in the same files are hand-ported in ReferenceDmlCorpusSpec.
  */
class ReferenceUpdateDeleteCorpusSpec extends GoScriptCorpusSpec {
  val path = "/root/reference/enginetest/queries/update_queries.go"
  val varNames =
    Seq("UpdateScriptTests", "UpdateIgnoreScripts", "UpdateErrorScripts")
  override def fixtures: Seq[String] = GoFixtures.updateSet
  override val blockDivergences = Map(
    // triggers are agreed-descoped OLTP surface (SURVEY §2.12)
    "UPDATE join – multiple tables, with trigger" ->
      "CREATE TRIGGER (descoped §2.12)",
    "UPDATE join – multiple tables with triggers that reference row values" ->
      "CREATE TRIGGER (descoped §2.12)",
    "UPDATE join – multiple tables with same column names with triggers" ->
      "CREATE TRIGGER (descoped §2.12)")
  override val divergences = Map(
    // all three rows share pk=0: the expected ORDER BY pk output encodes
    // the reference's storage tie order, which no ORDER BY guarantees
    "SELECT * FROM pkTable order by pk" ->
      "ORDER BY tie order on duplicate pk values")
  registerAll()
}

class ReferenceDeleteCorpusSpec extends GoScriptCorpusSpec {
  val path = "/root/reference/enginetest/queries/delete_queries.go"
  val varNames = Seq("DeleteErrorTests")
  override def fixtures: Seq[String] = GoFixtures.updateSet
  registerAll()
}

/** Fixture SQL mirroring the reference's scriptgen/setup/setup_data.sg.go
  * SetupScript blocks (MytableData, FloattableData, NiltableData,
  * TypestableData, Pk_tablesData, OthertableData, TabletestData). */
object GoFixtures {
  val mytable = Seq(
    "create table mytable (i bigint primary key, s varchar(20) comment 'column s' NOT NULL)",
    "insert into mytable values (1, 'first row'), (2, 'second row'), (3, 'third row')")
  val floattable = Seq(
    "CREATE TABLE `floattable` (`i` bigint NOT NULL, `f32` float NOT NULL, `f64` double NOT NULL, PRIMARY KEY (`i`))",
    "insert into floattable values (1, 1.0, 1.0), (2, 1.5, 1.5), (3, 2.0, 2.0), (4, 2.5, 2.5), (-1, -1.0, -1.0), (-2, -1.5, -1.5)")
  val niltable = Seq(
    "CREATE TABLE `niltable` (`i` bigint NOT NULL, `i2` bigint, `b` tinyint, `f` double, PRIMARY KEY (`i`))",
    "insert into niltable values (1,null,null,null), (2,2,1,null), (3,null,0,null), (4,4,null,4.0), (5,null,1,5.0), (6,6,0,6.0)")
  val typestable = Seq(
    "CREATE TABLE `typestable` (`id` bigint NOT NULL, `i8` tinyint, `i16` smallint, `i32` int, `i64` bigint, " +
      "`u8` tinyint unsigned, `u16` smallint unsigned, `u32` int unsigned, `u64` bigint unsigned, `f32` float, " +
      "`f64` double, `ti` timestamp, `da` date, `te` varchar(20), `bo` tinyint, `js` json, `bl` blob, " +
      "`e1` enum('', 'v1', 'v2'), `s1` set('', 'v1', 'v2'), PRIMARY KEY (`id`))",
    "insert into typestable values (1,2,3,4,5,6,7,8,9,10.0,11.0,'2019-12-31 12:00:00','2019-12-31','fourteen', 0,null,null, '', '')")
  val pkTables = Seq(
    "create table one_pk (pk smallint primary key, c1 smallint, c2 smallint, c3 smallint, c4 smallint, c5 smallint)",
    "insert into one_pk values (0,0,1,2,3,4), (1,10,11,12,13,14), (2,20,21,22,23,24), (3,30,31,32,33,34)",
    "create table two_pk (pk1 tinyint, pk2 tinyint, c1 tinyint NOT NULL, c2 tinyint NOT NULL, c3 tinyint NOT NULL, " +
      "c4 tinyint NOT NULL, c5 tinyint NOT NULL, primary key (pk1, pk2))",
    "insert into two_pk values (0,0,0,1,2,3,4), (0,1,10,11,12,13,14), (1,0,20,21,22,23,24), (1,1,30,31,32,33,34)",
    "create table one_pk_two_idx (pk bigint primary key, v1 bigint, v2 bigint)",
    "insert into one_pk_two_idx values (0,0,0), (1,1,1), (2,2,2), (3,3,3), (4,4,4), (5,5,5), (6,6,6), (7,7,7)",
    "create table one_pk_three_idx (pk bigint primary key, v1 bigint, v2 bigint, v3 bigint)",
    "insert into one_pk_three_idx values (0,0,0,0), (1,0,0,1), (2,0,1,0), (3,0,2,2), (4,1,0,0), (5,2,0,3), (6,3,3,0), (7,4,4,4)")
  val othertable = Seq(
    "create table othertable (s2 varchar(20) not null, i2 bigint primary key)",
    "insert into othertable values ('first', 3), ('second', 2), ('third', 1)")
  val tabletest = Seq(
    "create table tabletest (i int primary key, s text not null)",
    "insert into tabletest values (1, 'first row'), (2, 'second row'), (3, 'third row')")

  val updateSet: Seq[String] =
    Seq("create database if not exists mydb", "use mydb") ++
    mytable ++ floattable ++ niltable ++
    typestable ++ pkTables ++ othertable ++ tabletest

  // Fk_tblData + FooData (setup_data.sg.go) for the info-schema corpus
  val fkTbl = Seq(
    "CREATE TABLE `fk_tbl` (`pk` bigint NOT NULL, `a` bigint, `b` varchar(20), PRIMARY KEY (`pk`))",
    "ALTER TABLE fk_tbl ADD CONSTRAINT fk1 FOREIGN KEY (a,b) REFERENCES mytable (i,s) ON DELETE CASCADE")
  val foo = Seq(
    "create database if not exists foo",
    "create table foo.othertable (text varchar(20) primary key, number mediumint)",
    "insert into foo.othertable values ('a', 4), ('b', 2), ('c', 0)")
  // full MytableData (indexes + view) for info-schema probes
  val mytableFull: Seq[String] = mytable ++ Seq(
    "create unique index mytable_s on mytable (s)",
    "create index mytable_i_s on mytable (i,s)",
    "create index `idx_si` on mytable (`s`,`i`)",
    "create view myview as SELECT * FROM mytable")
  val infoSchemaSet: Seq[String] =
    Seq("create database if not exists mydb", "use mydb") ++
    mytableFull ++ fkTbl ++ foo
}
