package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{expressions => gfx, json => gjson, MySqlFormat}
import org.apache.spark.sql.functions._

/** Scalar function library — SURVEY.md §2.8 (reference registry of 346
  * functions at sql/expression/function/registry.go). One query per bucket,
  * exercising the Spark built-ins (all codegen'd Catalyst expressions) that
  * cover the corresponding MySQL functions; MySQL-specific gaps (date_format
  * translator, inet/conv/elt/field) live in graft.functions.
  */
object Functions {

  val defs: Seq[QueryDef] = Seq(

    // ---- string bucket (function/string.go etc.)
    QueryDef(
      "fn_string",
      (s, d) =>
        Tables.t(s, d, "part")
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("uname"),
            lower(col("p_brand")).as("lbrand"),
            substring(col("p_name"), 1, 8).as("prefix8"),
            expr("left(p_name, 3)").as("l3"),
            expr("right(p_name, 3)").as("r3"),
            length(col("p_name")).as("name_len"),
            concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
            lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
            rpad(col("p_brand"), 12, "*").as("brand_pad"),
            regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
            reverse(col("p_name")).as("rname"),
            instr(col("p_name"), "a").as("first_a"),
            translate(col("p_name"), "abc", "xyz").as("trans"),
            repeat(col("p_brand"), 2).as("brand2"),
            trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
            ascii(substring(col("p_name"), 1, 1)).as("first_ord"),
            size(split(col("p_name"), " ")).as("n_words"),
            replace(col("p_type"), lit("a"), lit("@")).as("type_at"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
                upper(p_name) AS uname, lower(p_brand) AS lbrand,
                substr(p_name, 1, 8) AS prefix8,
                left(p_name, 3) AS l3, right(p_name, 3) AS r3,
                length(p_name) AS name_len,
                concat_ws('-', p_brand, p_type) AS brand_type,
                lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
                rpad(p_brand, 12, '*') AS brand_pad,
                regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
                reverse(p_name) AS rname,
                instr(p_name, 'a') AS first_a,
                translate(p_name, 'abc', 'xyz') AS trans,
                repeat(p_brand, 2) AS brand2,
                trim('  ' || p_name || '  ') AS trimmed,
                ascii(substr(p_name, 1, 1)) AS first_ord,
                len(string_split(p_name, ' ')) AS n_words,
                replace(p_type, 'a', '@') AS type_at
              FROM part ORDER BY p_partkey""")),

    // ---- math bucket (integer ops exact; transcendentals rounded to 6dp
    //      because libm implementations differ in the last ulp)
    QueryDef(
      "fn_math",
      (s, d) =>
        Tables.t(s, d, "part")
          .select(
            col("p_partkey"),
            abs(col("p_size") - 25).as("abs_off"),
            ceil(col("p_retailprice")).as("ceil_p"),
            floor(col("p_retailprice")).as("floor_p"),
            round(col("p_retailprice"), 1).as("round_p"),
            (col("p_size") % 7).as("mod7"),
            signum(col("p_size") - lit(25)).cast("int").as("sgn"),
            greatest(col("p_size"), lit(10)).as("gst"),
            least(col("p_size"), lit(40)).as("lst"),
            sqrt(col("p_size")).as("sqrt_sz"),
            round(log(col("p_size") + 1), 6).as("ln_sz"),
            round(log10(col("p_size") + 1), 6).as("log10_sz"),
            round(exp(col("p_size") / lit(25.0)), 6).as("exp_sz"),
            round(pow(col("p_size"), 1.5), 6).as("pow_sz"),
            expr("p_partkey & 255").as("band"),
            expr("p_partkey | 256").as("bor"),
            expr("p_partkey ^ 129").as("bxor"),
            shiftleft(col("p_partkey"), 2).as("shl"),
            shiftright(col("p_partkey"), 1).as("shr"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
                abs(p_size - 25) AS abs_off,
                CAST(ceil(p_retailprice) AS BIGINT) AS ceil_p,
                CAST(floor(p_retailprice) AS BIGINT) AS floor_p,
                round(p_retailprice, 1) AS round_p,
                p_size % 7 AS mod7,
                CAST(sign(p_size - 25) AS INT) AS sgn,
                greatest(p_size, 10) AS gst, least(p_size, 40) AS lst,
                sqrt(p_size) AS sqrt_sz,
                round(ln(p_size + 1), 6) AS ln_sz,
                round(log10(p_size + 1), 6) AS log10_sz,
                round(exp(p_size / 25.0), 6) AS exp_sz,
                round(pow(p_size, 1.5), 6) AS pow_sz,
                p_partkey & 255 AS band,
                p_partkey | 256 AS bor,
                xor(p_partkey, 129) AS bxor,
                p_partkey << 2 AS shl,
                p_partkey >> 1 AS shr
              FROM part ORDER BY p_partkey""")),

    // ---- extended math: TRUNCATE (toward zero, ± digits), cot,
    //      degrees/radians/atan2/pi (reference function/math.go family)
    QueryDef(
      "fn_math_ext",
      (s, d) => {
        // MySQL TRUNCATE(x, dgt): toward zero at 10^dgt
        def truncAt(x: org.apache.spark.sql.Column, dgt: Int) = {
          val p = math.pow(10, dgt)
          (signum(x) * floor(abs(x) * p) / p)
        }
        val x = col("p_retailprice") - 1000 // mixed signs
        Tables.t(s, d, "part")
          .select(
            col("p_partkey"),
            truncAt(x, 1).as("trunc1"),
            truncAt(x, 0).as("trunc0"),
            truncAt(x, -2).as("trunc_m2"),
            round(degrees(col("p_size")), 6).as("deg"),
            round(radians(col("p_size")), 6).as("rad"),
            round(atan2(col("p_size"), lit(7)), 6).as("at2"),
            round(lit(1.0) / tan(col("p_size")), 6).as("cot_sz"),
            round(lit(math.Pi), 6).as("pi_const"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
                sign(p_retailprice - 1000) *
                  floor(abs(p_retailprice - 1000) * 10) / 10 AS trunc1,
                sign(p_retailprice - 1000) *
                  floor(abs(p_retailprice - 1000)) AS trunc0,
                sign(p_retailprice - 1000) *
                  floor(abs(p_retailprice - 1000) * 0.01) / 0.01 AS trunc_m2,
                round(degrees(p_size), 6) AS deg,
                round(radians(p_size), 6) AS rad,
                round(atan2(p_size, 7), 6) AS at2,
                round(cot(p_size), 6) AS cot_sz,
                round(pi(), 6) AS pi_const
              FROM part ORDER BY p_partkey""")),

    // ---- date/time bucket incl. the MySQL %-format translator
    QueryDef(
      "fn_datetime",
      (s, d) =>
        Tables.t(s, d, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            quarter(col("o_orderdate")).as("qtr"),
            weekofyear(col("o_orderdate")).as("woy"),
            dayofyear(col("o_orderdate")).as("doy"),
            dayofweek(col("o_orderdate")).as("dow1"),
            hour(col("o_orderdate")).as("hr"),
            date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
            last_day(col("o_orderdate")).as("month_end"),
            date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
            datediff(lit("1999-01-01").cast("date"),
              col("o_orderdate").cast("date")).as("days_to_99"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("epoch_us"),
            MySqlFormat.dateFormat(col("o_orderdate"), "%Y-%m-%d").as("mysql_ymd"),
            MySqlFormat.dateFormat(col("o_orderdate"), "%d/%m/%Y %H:%i").as("mysql_dmy"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
                CAST(year(o_orderdate) AS INT) AS yr,
                CAST(month(o_orderdate) AS INT) AS mo,
                CAST(day(o_orderdate) AS INT) AS dom,
                CAST(quarter(o_orderdate) AS INT) AS qtr,
                CAST(weekofyear(o_orderdate) AS INT) AS woy,
                CAST(dayofyear(o_orderdate) AS INT) AS doy,
                CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow1,
                CAST(hour(o_orderdate) AS INT) AS hr,
                CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                last_day(CAST(o_orderdate AS DATE)) AS month_end,
                CAST(o_orderdate AS DATE) + 30 AS plus30,
                CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT)
                  AS days_to_99,
                epoch_us(o_orderdate) AS epoch_us,
                strftime(o_orderdate, '%Y-%m-%d') AS mysql_ymd,
                strftime(o_orderdate, '%d/%m/%Y %H:%M') AS mysql_dmy
              FROM orders ORDER BY o_orderkey""")),

    // ---- extended date/time bucket: to_days/from_days, yearweek (mode 0),
    //      timestampdiff, sec_to_time/time_to_sec, convert_tz, makedate,
    //      unix_timestamp/from_unixtime, str_to_date round-trip
    QueryDef(
      "fn_datetime_ext",
      (s, d) => {
        import graft.functions.DateTimeExt._
        val ev = Tables.t(s, d, "events")
        val dt = col("ts").cast("date")
        val tsec = hour(col("ts")) * 3600 + minute(col("ts")) * 60 +
          second(col("ts"))
        ev.select(
            col("event_id"),
            toDays(dt).as("to_days"),
            fromDays(toDays(dt)).as("from_days_rt"),
            yearWeek(dt).as("yw"),
            timestampDiffMonths(to_date(lit("2023-06-15")), dt).as("tsdiff_mo"),
            unix_timestamp(col("ts")).as("unix_s"),
            from_unixtime(unix_timestamp(col("ts"))).as("from_unix"),
            secToTime(tsec).as("sec2time"),
            timeToSec(secToTime(tsec)).as("time2sec_rt"),
            convertTzFromUtc(col("ts"), "America/New_York").as("ny_ts"),
            makeDate(year(dt), dayofyear(dt)).as("makedate_rt"),
            MySqlFormat.strToDate(
              MySqlFormat.dateFormat(dt, "%d/%m/%Y"), "%d/%m/%Y")
              .cast("date").as("str2date_rt"),
            date_format(dt, "MMMM").as("month_name"),
            date_format(dt, "EEEE").as("day_name"),
            ((dayofweek(dt) + 5) % 7).as("weekday_mysql"))
          .orderBy(col("event_id"))
      },
      Some("""WITH base AS (
                SELECT event_id, ts, CAST(ts AS DATE) AS dt,
                       hour(ts)*3600 + minute(ts)*60 +
                         CAST(floor(second(ts)) AS INT) AS tsec
                FROM events)
              SELECT event_id,
                CAST(date_diff('day', DATE '1970-01-01', dt) + 719528 AS BIGINT)
                  AS to_days,
                dt AS from_days_rt,
                CAST(CASE WHEN dt >= make_date(year(dt), 1, 1)
                            + CAST((7 - dayofweek(make_date(year(dt), 1, 1))) % 7 AS INT)
                     THEN year(dt)*100 +
                       (date_diff('day',
                          make_date(year(dt), 1, 1)
                            + CAST((7 - dayofweek(make_date(year(dt), 1, 1))) % 7 AS INT),
                          dt) // 7) + 1
                     ELSE (year(dt)-1)*100 +
                       (date_diff('day',
                          make_date(year(dt)-1, 1, 1)
                            + CAST((7 - dayofweek(make_date(year(dt)-1, 1, 1))) % 7 AS INT),
                          dt) // 7) + 1 END AS INT) AS yw,
                CAST((year(dt) - 2023)*12 + (month(dt) - 6)
                  - CASE WHEN day(dt) < 15 THEN 1 ELSE 0 END AS INT) AS tsdiff_mo,
                CAST(floor(epoch(ts)) AS BIGINT) AS unix_s,
                strftime(make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000),
                  '%Y-%m-%d %H:%M:%S') AS from_unix,
                printf('%02d:%02d:%02d', tsec // 3600, (tsec % 3600) // 60,
                  tsec % 60) AS sec2time,
                tsec AS time2sec_rt,
                timezone('America/New_York', timezone('UTC', ts)) AS ny_ts,
                dt AS makedate_rt,
                dt AS str2date_rt,
                strftime(dt, '%B') AS month_name,
                strftime(dt, '%A') AS day_name,
                CAST((dayofweek(dt) + 6) % 7 AS INT) AS weekday_mysql
              FROM base ORDER BY event_id"""))
      ,

    // ---- MySQL DATE_FORMAT/STR_TO_DATE reachable from SQL TEXT (reference
    //      sql/expression/function/dateformat.go, registered in registry.go).
    //      The session registry override translates %-specifiers through
    //      MySqlFormat.toJavaPattern; a user's `DATE_FORMAT(d, '%Y-%m')`
    //      must format, not echo `%Y` as a Java-pattern literal. Exercises
    //      %Y %m %d %H %i %s %W %j via Engine.query AND the same patterns
    //      via the DataFrame API, proving both routes agree.
    QueryDef(
      "fn_dateformat_sql",
      (s, d) => {
        Tables.register(s, d, "orders")
        val e = new graft.Engine(s)
        e.query("""SELECT o_orderkey,
                     DATE_FORMAT(o_orderdate, '%Y-%m') AS ym,
                     DATE_FORMAT(o_orderdate, '%d/%m/%Y') AS dmy,
                     DATE_FORMAT(o_orderdate, '%H:%i:%s') AS hms,
                     DATE_FORMAT(o_orderdate, '%W') AS wday,
                     DATE_FORMAT(o_orderdate, '%j') AS doy,
                     STR_TO_DATE(DATE_FORMAT(o_orderdate, '%d/%m/%Y'),
                       '%d/%m/%Y') AS rt_date,
                     STR_TO_DATE(DATE_FORMAT(o_orderdate, '%d/%m/%Y %H:%i'),
                       '%d/%m/%Y %H:%i') AS rt_ts,
                     o_orderdate
                   FROM orders ORDER BY o_orderkey""")
          .withColumn("df_api",
            graft.functions.MySqlFormat.dateFormat(col("o_orderdate"), "%Y-%m"))
          .drop("o_orderdate")
      },
      Some("""SELECT o_orderkey,
                strftime(o_orderdate, '%Y-%m') AS ym,
                strftime(o_orderdate, '%d/%m/%Y') AS dmy,
                strftime(o_orderdate, '%H:%M:%S') AS hms,
                strftime(o_orderdate, '%A') AS wday,
                strftime(o_orderdate, '%j') AS doy,
                CAST(o_orderdate AS DATE) AS rt_date,
                CAST(o_orderdate AS TIMESTAMP) AS rt_ts,
                strftime(o_orderdate, '%Y-%m') AS df_api
              FROM orders ORDER BY o_orderkey""")),

    // ---- WEEK(date, mode) full mode table 0..7 (reference
    //      sql/expression/function/time.go WEEK) — week start (Sun/Mon),
    //      week-1 rule (first full week vs >=4-days), 0..53 vs 1..53
    //      ranges, and the >=4-days modes' December roll-forward into the
    //      next year's week 1. The oracle re-derives each mode from first
    //      principles in DuckDB (dayofweek there is Sunday=0).
    QueryDef(
      "fn_week_modes",
      (s, d) => {
        import graft.functions.DateTimeExt
        val dt = col("o_orderdate").cast("date")
        val cols = col("o_orderkey") +:
          (0 to 7).map(m => DateTimeExt.week(dt, m).as(s"w$m"))
        Tables.t(s, d, "orders").select(cols: _*).orderBy(col("o_orderkey"))
      },
      Some {
        def weekSql(mode: Int): String =
          if (mode == 3) "CAST(weekofyear(dt) AS INT)"
          else {
            val monday = mode % 2 == 1
            val fourDays = Set(1, 4, 6)(mode)
            val zeroRange = Set(0, 1, 4, 5)(mode)
            def dowOf(j: String) =
              if (monday) s"(dayofweek($j)+6)%7" else s"dayofweek($j)"
            def startOf(y: String) = {
              val j = s"make_date($y,1,1)"
              if (fourDays)
                s"($j + CAST(CASE WHEN ${dowOf(j)} <= 3 THEN -(${dowOf(j)}) ELSE 7-(${dowOf(j)}) END AS INT))"
              else
                s"($j + CAST((7-(${dowOf(j)}))%7 AS INT))"
            }
            def wk(start: String) = s"((date_diff('day', $start, dt) // 7) + 1)"
            val s0 = startOf("year(dt)")
            val before = if (zeroRange) "0" else wk(startOf("year(dt)-1"))
            val main = s"CASE WHEN dt >= $s0 THEN ${wk(s0)} ELSE $before END"
            val full =
              if (fourDays && !zeroRange)
                s"CASE WHEN dt >= ${startOf("year(dt)+1")} THEN 1 ELSE $main END"
              else main
            s"CAST($full AS INT)"
          }
        s"""SELECT o_orderkey,
              ${(0 to 7).map(m => s"${weekSql(m)} AS w$m").mkString(", ")}
            FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS dt
                  FROM orders)
            ORDER BY o_orderkey"""
      }),

    // ---- registry long tail (reference registry.go): the MySQL scalar
    //      functions Spark lacks natively, registered under their MySQL
    //      names (functions/MiscFns.scala) and exercised here as SQL TEXT
    //      so the whole path — name resolution through the session
    //      registry to codegen'd compositions — is oracle-checked.
    QueryDef(
      "fn_longtail",
      (s, d) => {
        Tables.register(s, d, "orders")
        new graft.Engine(s).query(
          """SELECT o_orderkey,
               MID(o_orderpriority, 3, 4) AS prio_mid,
               STRCMP(o_orderstatus, 'O') AS cmp_o,
               ORD(o_orderpriority) AS prio_ord,
               OCT(o_orderkey) AS key_oct,
               ADDDATE(o_orderdate, 5) AS plus5,
               SUBDATE(o_orderdate, 3) AS minus3,
               WEEKDAY(o_orderdate) AS wd,
               VALIDATE_PASSWORD_STRENGTH(SUBSTRING(o_orderpriority, 1, o_orderkey % 12))
                 AS pw,
               IS_IPV4_COMPAT(INET6_ATON('::1.2.3.4')) AS compat_t,
               IS_IPV4_COMPAT(INET6_ATON('fdfe::1')) AS compat_f,
               IS_IPV4_MAPPED(INET6_ATON('::ffff:1.2.3.4')) AS mapped_t,
               VEC_TOTEXT(TO_VECTOR(CONCAT('[', o_orderkey % 10, '.5, 2]')))
                 AS vec_rt
             FROM orders ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey,
                substr(o_orderpriority, 3, 4) AS prio_mid,
                CASE WHEN o_orderstatus < 'O' THEN -1
                     WHEN o_orderstatus > 'O' THEN 1 ELSE 0 END AS cmp_o,
                CAST(ord(o_orderpriority) AS BIGINT) AS prio_ord,
                format('{:o}', o_orderkey) AS key_oct,
                CAST(o_orderdate AS DATE) + 5 AS plus5,
                CAST(o_orderdate AS DATE) - 3 AS minus3,
                CAST((dayofweek(CAST(o_orderdate AS DATE)) + 6) % 7 AS INT) AS wd,
                CAST((SELECT CASE
                  WHEN length(ss) < 4 THEN 0
                  WHEN length(ss) < 8 THEN 25
                  ELSE 50 +
                    CASE WHEN regexp_matches(ss, '[0-9]')
                          AND regexp_matches(ss, '[a-z]')
                          AND regexp_matches(ss, '[A-Z]')
                      THEN 25 ELSE 0 END +
                    CASE WHEN regexp_matches(ss, '[0-9]')
                          AND regexp_matches(ss, '[a-z]')
                          AND regexp_matches(ss, '[A-Z]')
                          AND regexp_matches(ss, '[^a-zA-Z0-9]')
                      THEN 25 ELSE 0 END
                  END
                  FROM (SELECT substr(o_orderpriority, 1,
                    CAST(o_orderkey % 12 AS INT)) AS ss)) AS INT) AS pw,
                TRUE AS compat_t,
                FALSE AS compat_f,
                TRUE AS mapped_t,
                '[' || (o_orderkey % 10) || '.5, 2]' AS vec_rt
              FROM orders ORDER BY o_orderkey""")),

    // ---- control-flow / null-handling bucket (if/ifnull/nullif/coalesce/case)
    QueryDef(
      "fn_conditional",
      (s, d) =>
        Tables.t(s, d, "customer")
          .select(
            col("c_custkey"),
            when(col("c_acctbal") < 0, lit("neg")).otherwise(lit("pos")).as("bal_sign"),
            nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(none)"))
              .as("seg_filled"),
            greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
            least(col("c_acctbal"), lit(1000.0)).as("bal_cap"),
            col("c_acctbal").isNull.as("bal_is_null"),
            when(col("c_nationkey") % 2 === 0, col("c_acctbal")).as("even_bal"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
                CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_sign,
                nullif(c_mktsegment, 'BUILDING') AS seg_nb,
                coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg_filled,
                greatest(c_acctbal, 0.0) AS bal_floor,
                least(c_acctbal, 1000.0) AS bal_cap,
                c_acctbal IS NULL AS bal_is_null,
                CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal END AS even_bal
              FROM customer ORDER BY c_custkey""")),

    // ---- regex bucket (reference uses ICU; Java/RE2 dialects agree on
    //      these simple patterns)
    QueryDef(
      "fn_regexp",
      (s, d) =>
        Tables.t(s, d, "documents")
          .select(
            col("doc_id"),
            regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
            regexp_replace(col("text"), "[aeiou]", "_").as("masked"),
            col("text").rlike("join.*merge").as("has_join_merge"),
            regexp_extract(col("text"), "(\\w+) (\\w+)", 2).as("second_word"),
            expr("regexp_instr(text, 'data')").as("data_pos"),
            expr("coalesce(regexp_substr(text, '[a-z]*ing'), '')").as("ing_word"),
            expr("regexp_count(text, 'the')").as("n_the"))
          .orderBy(col("doc_id"))
          .limit(500),
      Some("""SELECT doc_id,
                regexp_extract(text, '([a-z]+)', 1) AS first_word,
                regexp_replace(text, '[aeiou]', '_', 'g') AS masked,
                regexp_matches(text, 'join.*merge') AS has_join_merge,
                regexp_extract(text, '(\w+) (\w+)', 2) AS second_word,
                CAST(coalesce(instr(text, 'data'),0) AS INT) AS data_pos,
                coalesce(regexp_extract(text, '[a-z]*ing'), '') AS ing_word,
                CAST(len(regexp_extract_all(text, 'the')) AS INT) AS n_the
              FROM documents ORDER BY doc_id LIMIT 500""")),

    // ---- JSON bucket (function/json/; MySQL json_extract ~ $.path)
    QueryDef(
      "fn_json",
      (s, d) =>
        Tables.t(s, d, "events")
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").as("k_str"),
            get_json_object(col("props"), "$.k").cast("int").as("k_int"),
            get_json_object(col("props"), "$.missing").as("k_missing"),
            json_array_length(lit("""[1,2,3,4]""")).as("arr_len"),
            get_json_object(
              concat(lit("""{"a":{"b":["""), col("event_id").cast("string"), lit(",2]}}")),
              "$.a.b[0]").as("nested"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id,
                json_extract_string(props, '$.k') AS k_str,
                CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
                json_extract_string(props, '$.missing') AS k_missing,
                CAST(json_array_length('[1,2,3,4]') AS INT) AS arr_len,
                json_extract_string('{"a":{"b":[' || event_id || ',2]}}', '$.a.b[0]')
                  AS nested
              FROM events ORDER BY event_id""")),

    // ---- crypto/encode bucket (md5/sha2; reference function/encode.go)
    QueryDef(
      "fn_hash",
      (s, d) =>
        Tables.t(s, d, "customer")
          .select(
            col("c_custkey"),
            md5(col("c_name").cast("binary")).as("name_md5"),
            sha2(col("c_name").cast("binary"), 256).as("name_sha256"),
            lower(hex(col("c_name").cast("binary"))).as("name_hex"),
            base64(col("c_name").cast("binary")).as("name_b64"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
                md5(c_name) AS name_md5,
                sha256(c_name) AS name_sha256,
                lower(hex(encode(c_name))) AS name_hex,
                to_base64(encode(c_name)) AS name_b64
              FROM customer ORDER BY c_custkey""")),

    // ---- collations (SURVEY §7.4 hard-part 4: MySQL utf8mb4_*_ci).
    //      Spark 4 native collations: UTF8_LCASE equality/grouping covers
    //      the case-insensitivity axis; the accent axis is fn_collation_ai
    //      below. Distinct/grouping under the collation merge case
    //      variants without materializing lower() copies.
    QueryDef(
      "fn_collation",
      (s, d) => {
        val mixed = when(col("c_custkey") % 2 === 0,
          upper(col("c_mktsegment"))).otherwise(lower(col("c_mktsegment")))
        Tables.t(s, d, "customer")
          .select(col("c_custkey"), mixed.as("seg_mixed"))
          .agg(
            countDistinct(col("seg_mixed")).as("n_binary"),
            countDistinct(collate(col("seg_mixed"), "UTF8_LCASE")).as("n_ci"),
            sum((collate(col("seg_mixed"), "UTF8_LCASE") ===
              collate(lit("automobile"), "UTF8_LCASE")).cast("long"))
              .as("n_auto_ci"))
      },
      Some("""SELECT
                CAST(COUNT(DISTINCT seg_mixed) AS BIGINT) AS n_binary,
                CAST(COUNT(DISTINCT lower(seg_mixed)) AS BIGINT) AS n_ci,
                CAST(SUM(CASE WHEN lower(seg_mixed) = 'automobile' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_auto_ci
              FROM (SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                           ELSE lower(c_mktsegment) END AS seg_mixed
                    FROM customer)""")),

    // ---- accent-insensitive collation — MySQL's DEFAULT collation is
    //      utf8mb4_0900_ai_ci (reference sql/collations.go), so ai_ci
    //      equality/grouping is table-stakes. Two implementations, proven
    //      equal: (a) AccentFold (NFD + strip combining marks + lowercase)
    //      — grouping on the fold keeps shuffle keys plain binary; (b)
    //      Spark 4's native ICU UNICODE_CI_AI collation. The oracle
    //      re-derives the fold with DuckDB's strip_accents + lower.
    QueryDef(
      "fn_collation_ai",
      (s, d) => {
        val seg = lower(col("c_mktsegment"))
        val mixed = when(col("c_custkey") % 3 === 0,
            translate(seg, "aeiou", "áéíóú"))
          .when(col("c_custkey") % 3 === 1, upper(seg))
          .otherwise(seg)
        Tables.t(s, d, "customer")
          .select(col("c_custkey"), mixed.as("seg_mixed"))
          .agg(
            countDistinct(col("seg_mixed")).as("n_binary"),
            countDistinct(gfx.accentFold(col("seg_mixed"))).as("n_ai_fold"),
            countDistinct(collate(col("seg_mixed"), "UNICODE_CI_AI"))
              .as("n_ai_native"),
            sum((gfx.accentFold(col("seg_mixed")) === lit("automobile"))
              .cast("long")).as("n_auto_ai"),
            sum((collate(col("seg_mixed"), "UNICODE_CI_AI") ===
              collate(lit("autómobilé"), "UNICODE_CI_AI"))
              .cast("long")).as("n_auto_native"))
      },
      Some("""WITH m AS (
                SELECT CASE
                         WHEN c_custkey % 3 = 0
                           THEN translate(lower(c_mktsegment), 'aeiou', 'áéíóú')
                         WHEN c_custkey % 3 = 1 THEN upper(c_mktsegment)
                         ELSE lower(c_mktsegment) END AS seg_mixed
                FROM customer)
              SELECT
                CAST(COUNT(DISTINCT seg_mixed) AS BIGINT) AS n_binary,
                CAST(COUNT(DISTINCT lower(strip_accents(seg_mixed))) AS BIGINT)
                  AS n_ai_fold,
                CAST(COUNT(DISTINCT lower(strip_accents(seg_mixed))) AS BIGINT)
                  AS n_ai_native,
                CAST(SUM(CASE WHEN lower(strip_accents(seg_mixed)) = 'automobile'
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_auto_ai,
                CAST(SUM(CASE WHEN lower(strip_accents(seg_mixed)) = 'automobile'
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_auto_native
              FROM m""")),

    // ---- MySQL type-layer semantics (SURVEY §1.2): ENUM index/validation,
    //      SET bitmask render, YEAR range check, UNSIGNED BIGINT beyond
    //      Long range via DECIMAL(20,0), BOOLEAN-as-tinyint
    QueryDef(
      "fn_types",
      (s, d) => {
        val enumIdx = gfx.field(col("c_mktsegment"), lit("AUTOMOBILE"),
          lit("BUILDING"), lit("FURNITURE"), lit("MACHINERY"), lit("HOUSEHOLD"))
        val yr = (lit(1880) + col("c_custkey") % 300).cast("int")
        Tables.t(s, d, "customer")
          .select(
            col("c_custkey"),
            // ENUM: index->string round-trip; invalid value -> NULL
            when(enumIdx > 0, col("c_mktsegment")).otherwise(lit(null))
              .as("enum_valid"),
            enumIdx.as("enum_idx"),
            // SET('a','b','c') stored as bitmask, rendered as csv
            gfx.makeSet(col("c_custkey") % 8, lit("read"), lit("write"),
              lit("exec")).as("set_render"),
            (expr("(c_custkey % 8) & 2") > 0).as("set_has_write"),
            // YEAR: valid range 1901..2155 else NULL (sql/types/year.go:40)
            when(yr.between(1901, 2155), yr).otherwise(lit(null)).as("year_chk"),
            // UNSIGNED BIGINT max - key: exceeds Long, lives in DECIMAL(20,0);
            // rendered as text because DECIMAL(21,0) exceeds every engine's
            // native int and degrades to lossy float in the comparison layer
            (lit("18446744073709551615").cast("decimal(20,0)") -
              col("c_custkey").cast("decimal(20,0)")).cast("string").as("ubig"),
            // BOOLEAN is tinyint: TRUE+TRUE+FALSE = 2
            ((col("c_custkey") % 2 === 0).cast("int") +
              (col("c_custkey") % 3 === 0).cast("int")).as("bool_arith"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
                CASE WHEN c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE',
                  'MACHINERY','HOUSEHOLD') THEN c_mktsegment END AS enum_valid,
                CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2
                  WHEN 'FURNITURE' THEN 3 WHEN 'MACHINERY' THEN 4
                  WHEN 'HOUSEHOLD' THEN 5 ELSE 0 END AS enum_idx,
                concat_ws(',',
                  CASE WHEN (c_custkey % 8) & 1 = 1 THEN 'read' END,
                  CASE WHEN (c_custkey % 8) & 2 = 2 THEN 'write' END,
                  CASE WHEN (c_custkey % 8) & 4 = 4 THEN 'exec' END) AS set_render,
                ((c_custkey % 8) & 2) > 0 AS set_has_write,
                CASE WHEN 1880 + c_custkey % 300 BETWEEN 1901 AND 2155
                  THEN CAST(1880 + c_custkey % 300 AS INT) END AS year_chk,
                CAST(CAST('18446744073709551615' AS DECIMAL(20,0))
                  - CAST(c_custkey AS DECIMAL(20,0)) AS VARCHAR) AS ubig,
                CAST(c_custkey % 2 = 0 AS INT) + CAST(c_custkey % 3 = 0 AS INT)
                  AS bool_arith
              FROM customer ORDER BY c_custkey""")),

    // ---- compress/uncompress/uncompressed_length (reference registry.go
    //      compress family; MySQL 4-byte-LE-header + zlib format). The
    //      compressed bytes themselves are zlib-version-dependent, so the
    //      oracle checks the MySQL-defined invariants: header length equals
    //      the input length and the round-trip is the identity.
    QueryDef(
      "fn_compress",
      (s, d) => {
        val comp = gfx.compress(col("text"))
        Tables.t(s, d, "documents")
          .select(
            col("doc_id"),
            gfx.uncompressedLength(comp).as("ulen"),
            (gfx.uncompress(comp) === col("text")).as("rt_ok"),
            (length(comp) > 4).as("has_payload"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
                CAST(length(text) AS INT) AS ulen,
                TRUE AS rt_ok,
                TRUE AS has_payload
              FROM documents ORDER BY doc_id""")),

    // ---- native custom expressions (graft.functions.expressions): the
    //      MySQL functions Spark lacks, evaluated as Catalyst Expressions
    QueryDef(
      "fn_mysql_native",
      (s, d) => {
        val ip = concat_ws(".",
          (col("c_custkey") % 256).cast("string"),
          (col("c_custkey") * 7 % 256).cast("string"),
          (col("c_custkey") * 13 % 256).cast("string"),
          (col("c_custkey") * 29 % 256).cast("string"))
        Tables.t(s, d, "customer")
          .select(
            col("c_custkey"),
            gfx.field(col("c_mktsegment"), lit("AUTOMOBILE"), lit("BUILDING"),
              lit("FURNITURE"), lit("MACHINERY"), lit("HOUSEHOLD")).as("seg_idx"),
            gfx.insertStr(col("c_name"), lit(3), lit(2), lit("XX")).as("spliced"),
            gfx.inetAton(ip).as("ip_num"),
            gfx.inetNtoa(col("c_custkey") * 99991 % 4294967296L).as("ip_str"),
            gfx.exportSet(col("c_custkey"), lit("1"), lit("0"), lit(","), lit(8))
              .as("bits_csv"),
            gfx.quoteStr(col("c_name")).as("quoted"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
                CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2
                  WHEN 'FURNITURE' THEN 3 WHEN 'MACHINERY' THEN 4
                  WHEN 'HOUSEHOLD' THEN 5 ELSE 0 END AS seg_idx,
                substr(c_name, 1, 2) || 'XX' || substr(c_name, 5) AS spliced,
                ((c_custkey % 256) * 16777216) + ((c_custkey * 7 % 256) * 65536) +
                  ((c_custkey * 13 % 256) * 256) + (c_custkey * 29 % 256) AS ip_num,
                CAST(((c_custkey * 99991 % 4294967296) >> 24) & 255 AS VARCHAR) || '.' ||
                CAST(((c_custkey * 99991 % 4294967296) >> 16) & 255 AS VARCHAR) || '.' ||
                CAST(((c_custkey * 99991 % 4294967296) >> 8) & 255 AS VARCHAR) || '.' ||
                CAST((c_custkey * 99991 % 4294967296) & 255 AS VARCHAR) AS ip_str,
                CAST((c_custkey >> 0) & 1 AS VARCHAR) || ',' ||
                CAST((c_custkey >> 1) & 1 AS VARCHAR) || ',' ||
                CAST((c_custkey >> 2) & 1 AS VARCHAR) || ',' ||
                CAST((c_custkey >> 3) & 1 AS VARCHAR) || ',' ||
                CAST((c_custkey >> 4) & 1 AS VARCHAR) || ',' ||
                CAST((c_custkey >> 5) & 1 AS VARCHAR) || ',' ||
                CAST((c_custkey >> 6) & 1 AS VARCHAR) || ',' ||
                CAST((c_custkey >> 7) & 1 AS VARCHAR) AS bits_csv,
                '''' || c_name || '''' AS quoted
              FROM customer ORDER BY c_custkey""")),

    // ---- extended string bucket: elt/find_in_set/conv/format/
    //      substring_index/chr are Spark built-ins (codegen'd); make_set and
    //      strcmp are the genuine gaps (native expression / CASE shape).
    QueryDef(
      "fn_string_ext",
      (s, d) =>
        Tables.t(s, d, "customer")
          .select(
            col("c_custkey"),
            expr("elt((c_custkey % 3) + 1, 'one', 'two', 'three')").as("elt_pick"),
            expr("""find_in_set(c_mktsegment,
              'AUTOMOBILE,BUILDING,FURNITURE,MACHINERY,HOUSEHOLD')""").as("seg_pos"),
            gfx.makeSet(col("c_custkey") % 8, lit("a"), lit("b"), lit("c"))
              .as("mset"),
            conv(col("c_custkey").cast("string"), 10, 16).as("hex16"),
            conv(col("c_custkey").cast("string"), 10, 2).as("bin2"),
            format_number(col("c_acctbal"), 2).as("bal_fmt"),
            substring_index(col("c_name"), "0", 3).as("sidx"),
            when(col("c_name") < col("c_mktsegment"), -1)
              .when(col("c_name") === col("c_mktsegment"), 0)
              .otherwise(1).as("cmp"),
            chr(lit(65) + col("c_custkey") % 26).as("chr_pick"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
                CASE (c_custkey % 3) + 1 WHEN 1 THEN 'one' WHEN 2 THEN 'two'
                  ELSE 'three' END AS elt_pick,
                CAST(coalesce(list_position(
                  string_split('AUTOMOBILE,BUILDING,FURNITURE,MACHINERY,HOUSEHOLD', ','),
                  c_mktsegment), 0) AS INT) AS seg_pos,
                concat_ws(',',
                  CASE WHEN (c_custkey % 8) & 1 = 1 THEN 'a' END,
                  CASE WHEN (c_custkey % 8) & 2 = 2 THEN 'b' END,
                  CASE WHEN (c_custkey % 8) & 4 = 4 THEN 'c' END) AS mset,
                upper(to_hex(c_custkey)) AS hex16,
                bin(c_custkey) AS bin2,
                CASE WHEN c_acctbal < 0 THEN '-' ELSE '' END ||
                  CASE WHEN length(printf('%.2f', abs(c_acctbal))) = 7
                       THEN substr(printf('%.2f', abs(c_acctbal)), 1, 1) || ',' ||
                            substr(printf('%.2f', abs(c_acctbal)), 2)
                       ELSE printf('%.2f', abs(c_acctbal)) END AS bal_fmt,
                array_to_string(string_split(c_name, '0')[1:3], '0') AS sidx,
                CASE WHEN c_name < c_mktsegment THEN -1
                     WHEN c_name = c_mktsegment THEN 0 ELSE 1 END AS cmp,
                chr(CAST(65 + c_custkey % 26 AS INT)) AS chr_pick
              FROM customer ORDER BY c_custkey""")),

    // ---- spatial ST_* core subset (reference function/spatial/, 15k LoC;
    //      the cartesian constructors/accessors/predicates re-expressed as
    //      native expressions over WKT — see graft.functions.spatial).
    //      Oracle computes the same planar math directly.
    QueryDef(
      "fn_spatial",
      (s, d) => {
        import graft.functions.{spatial => sp}
        val x = (col("c_custkey") % 100).cast("int")
        val y = (col("c_custkey") * 7 % 100).cast("int")
        val side = (col("c_custkey") % 10 + 1).cast("int")
        val pt = sp.stPoint(x, y)
        val ptw = sp.stPoint(x.cast("double") + 0.5, y.cast("double") + 0.5)
        val square = concat(
          lit("POLYGON((0 0, "), side, lit(" 0, "), side, lit(" "), side,
          lit(", 0 "), side, lit(", 0 0))"))
        val line = concat(
          lit("LINESTRING(0 0, "), x, lit(" "), y, lit(", "),
          x + 3, lit(" "), y + 4, lit(")"))
        Tables.t(s, d, "customer")
          .select(
            col("c_custkey"),
            sp.stX(pt).as("px"),
            sp.stY(pt).as("py"),
            sp.stDistance(pt, lit("POINT(50 50)")).as("dist_c"),
            sp.stArea(square).as("sq_area"),
            sp.stWithin(ptw, lit("POLYGON((25 25, 75 25, 75 75, 25 75, 25 25))"))
              .as("in_box"),
            sp.stLength(line).as("path_len"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH pts AS (
                SELECT c_custkey,
                       CAST(c_custkey % 100 AS DOUBLE) AS x,
                       CAST(c_custkey * 7 % 100 AS DOUBLE) AS y,
                       CAST(c_custkey % 10 + 1 AS DOUBLE) AS side
                FROM customer)
              SELECT c_custkey,
                x AS px, y AS py,
                sqrt((x - 50)*(x - 50) + (y - 50)*(y - 50)) AS dist_c,
                side * side AS sq_area,
                (x + 0.5) > 25 AND (x + 0.5) < 75 AND
                  (y + 0.5) > 25 AND (y + 0.5) < 75 AS in_box,
                sqrt(x*x + y*y) + 5 AS path_len
              FROM pts ORDER BY c_custkey""")),

    // ---- spatial wave 2 (reference spatial/st_intersects.go,
    //      st_contains.go, geohash.go, and the validating constructors in
    //      sql/types/geometry.go): geometry relations + WKT
    //      validation/normalization + geohash encode/decode. Relations use
    //      half-offset points so nothing sits exactly on a boundary; the
    //      oracle re-derives every predicate as planar arithmetic, and the
    //      geohash columns pin a public test vector plus a decode
    //      round-trip both engines agree on.
    QueryDef(
      "fn_spatial_relations",
      (s, d) => {
        import graft.functions.{spatial => sp}
        val k = col("c_custkey")
        val sq = (k % 5 + 3).cast("int") // square side 3..7
        val shift = (k % 9).cast("int")  // second square offset 0..8
        val px = (k % 10).cast("double") + 0.5
        val py = (k % 7).cast("double") + 0.5
        val squareA = concat(
          lit("POLYGON((0 0, "), sq, lit(" 0, "), sq, lit(" "), sq,
          lit(", 0 "), sq, lit(", 0 0))"))
        val squareB = concat(
          lit("POLYGON(("), shift, lit(" "), shift, lit(", "), shift + 2,
          lit(" "), shift, lit(", "), shift + 2, lit(" "), shift + 2,
          lit(", "), shift, lit(" "), shift + 2, lit(", "), shift, lit(" "),
          shift, lit("))"))
        val hline = concat(
          lit("LINESTRING(-1 "), shift, lit(", 10 "), shift, lit(")"))
        val pt = sp.stPoint(px, py)
        val messy = concat(lit("  point( "), k % 10, lit("   "), k % 7,
          lit(" ) "))
        val lon = (k % 360).cast("double") - 180.0 + 0.25
        val lat = (k % 180).cast("double") - 90.0 + 0.25
        val gh = sp.stGeoHash(lon, lat, lit(9))
        Tables.t(s, d, "customer")
          .select(
            col("c_custkey"),
            sp.stContains(squareA, pt).as("sq_has_pt"),
            sp.stIntersects(squareA, squareB).as("squares_meet"),
            sp.stIntersects(squareA, hline).as("line_crosses"),
            sp.stContains(squareA,
              lit("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))")).as("sq_has_unit"),
            sp.stGeomFromText(messy).as("norm_wkt"),
            sp.stGeomFromText(lit("POLYGON((0 0, 1 0, 1 1))")).as("bad_ring"),
            sp.stGeoHash(lit(-5.6), lit(42.6), lit(5)).as("gh_known"),
            (abs(sp.stLatFromGeoHash(gh) - lat) < 0.001 &&
              abs(sp.stLongFromGeoHash(gh) - lon) < 0.001).as("gh_roundtrip"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH g AS (
                SELECT c_custkey,
                       CAST(c_custkey % 5 + 3 AS DOUBLE) AS sq,
                       CAST(c_custkey % 9 AS DOUBLE) AS shift,
                       CAST(c_custkey % 10 AS DOUBLE) + 0.5 AS px,
                       CAST(c_custkey % 7 AS DOUBLE) + 0.5 AS py
                FROM customer)
              SELECT c_custkey,
                px < sq AND py < sq AS sq_has_pt,
                shift <= sq AS squares_meet,
                shift <= sq AS line_crosses,
                sq > 2 AS sq_has_unit,
                'POINT(' || CAST(c_custkey % 10 AS BIGINT) || ' '
                  || CAST(c_custkey % 7 AS BIGINT) || ')' AS norm_wkt,
                CAST(NULL AS VARCHAR) AS bad_ring,
                'ezs42' AS gh_known,
                TRUE AS gh_roundtrip
              FROM g ORDER BY c_custkey""")),

    // ---- spatial accessors wave 3 (reference spatial/ accessor files:
    //      st_startpoint/endpoint/pointn/numpoints, st_isclosed,
    //      st_envelope, st_dimension, st_geometrytype, st_swapxy, st_srid,
    //      st_exteriorring, st_disjoint, typed *fromtext constructors).
    //      Every expected value re-derives as string arithmetic in DuckDB.
    QueryDef(
      "fn_spatial_accessors",
      (s, d) => {
        import graft.functions.{spatial => sp}
        val k = col("c_custkey")
        val xi = (k % 10).cast("int"); val yi = (k % 7).cast("int")
        val sq = (k % 5 + 3).cast("int")
        val shift = (k % 9).cast("int")
        val line = concat(lit("LINESTRING(0 0, "), xi, lit(" "), yi,
          lit(", "), xi + 3, lit(" "), yi + 4, lit(")"))
        val ring = concat(lit("LINESTRING(0 0, "), sq, lit(" 0, "), sq,
          lit(" "), sq, lit(", 0 0)"))
        val squareA = concat(lit("POLYGON((0 0, "), sq, lit(" 0, "), sq,
          lit(" "), sq, lit(", 0 "), sq, lit(", 0 0))"))
        val squareB = concat(
          lit("POLYGON(("), shift, lit(" "), shift, lit(", "), shift + 2,
          lit(" "), shift, lit(", "), shift + 2, lit(" "), shift + 2,
          lit(", "), shift, lit(" "), shift + 2, lit(", "), shift, lit(" "),
          shift, lit("))"))
        val pt = sp.stPoint(xi, yi)
        Tables.t(s, d, "customer")
          .select(
            col("c_custkey"),
            sp.stNumPoints(line).as("n_pts"),
            sp.stStartPoint(line).as("p_start"),
            sp.stEndPoint(line).as("p_end"),
            sp.stPointN(line, lit(2)).as("p_mid"),
            sp.stIsClosed(line).as("open_closed"),
            sp.stIsClosed(ring).as("ring_closed"),
            sp.stEnvelope(squareB).as("env"),
            sp.stGeometryType(squareA).as("gtype"),
            sp.stDimension(squareA).as("dim"),
            sp.stSrid(pt).as("srid"),
            sp.stSwapXY(pt).as("swapped"),
            sp.stExteriorRing(squareA).as("outer_ring"),
            sp.stNumInteriorRings(squareA).as("n_holes"),
            sp.stDisjoint(squareA, squareB).as("disjoint"),
            sp.stIsEmpty(squareA).as("is_empty"),
            // zigzag whose hull drops (2 1) but keeps upper vertex (1 3)
            sp.stConvexHull(lit("LINESTRING(0 0, 1 3, 2 1, 3 4, 4 0)"))
              .as("hull"),
            // hull of a CCW square is the square itself
            sp.stConvexHull(squareB).as("hull_sq"),
            // lat/lon are geographic-only accessors: tag the point 4326
            // first (st_srid re-tags without re-projecting, so lon=x,
            // lat=y pass through)
            sp.stLongitude(sp.stSrid(pt, lit(4326))).as("lon"),
            sp.stLatitude(sp.stSrid(pt, lit(4326))).as("lat"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH g AS (
                SELECT c_custkey,
                       CAST(c_custkey % 10 AS BIGINT) AS x,
                       CAST(c_custkey % 7 AS BIGINT) AS y,
                       CAST(c_custkey % 5 + 3 AS BIGINT) AS sq,
                       CAST(c_custkey % 9 AS BIGINT) AS shift
                FROM customer)
              SELECT c_custkey,
                3 AS n_pts,
                'POINT(0 0)' AS p_start,
                'POINT(' || (x + 3) || ' ' || (y + 4) || ')' AS p_end,
                'POINT(' || x || ' ' || y || ')' AS p_mid,
                FALSE AS open_closed,
                TRUE AS ring_closed,
                'POLYGON((' || shift || ' ' || shift || ',' || (shift + 2)
                  || ' ' || shift || ',' || (shift + 2) || ' ' || (shift + 2)
                  || ',' || shift || ' ' || (shift + 2) || ',' || shift
                  || ' ' || shift || '))' AS env,
                'POLYGON' AS gtype,
                2 AS dim,
                0 AS srid,
                'POINT(' || y || ' ' || x || ')' AS swapped,
                'LINESTRING(0 0,' || sq || ' 0,' || sq || ' ' || sq
                  || ',0 ' || sq || ',0 0)' AS outer_ring,
                0 AS n_holes,
                NOT (shift <= sq) AS disjoint,
                FALSE AS is_empty,
                'POLYGON((0 0,4 0,3 4,1 3,0 0))' AS hull,
                'POLYGON((' || shift || ' ' || shift || ',' || (shift + 2)
                  || ' ' || shift || ',' || (shift + 2) || ' ' || (shift + 2)
                  || ',' || shift || ' ' || (shift + 2) || ',' || shift
                  || ' ' || shift || '))' AS hull_sq,
                CAST(x AS DOUBLE) AS lon,
                CAST(y AS DOUBLE) AS lat
              FROM g ORDER BY c_custkey""")),

    // ---- multi-geometry wave 4 (reference sql/types/multipoint.go,
    //      multilinestring.go, multipolygon.go, geometrycollection.go;
    //      st_numgeometries.go, st_geometryn.go): constructors,
    //      component count/access, relations, WKB + GeoJSON round-trips.
    //      Half-offset coordinates (.5/.25) keep every value off polygon
    //      boundaries AND fractional, so double->string rendering agrees
    //      between both engines (an integral double would print '10.0'
    //      in DuckDB but '10' here).
    QueryDef(
      "fn_spatial_multi",
      (s, d) => {
        import graft.functions.{spatial => sp}
        val k = col("c_custkey")
        val px = (k % 10).cast("double") + 0.5
        val py = (k % 7).cast("double") + 0.5
        val mp = concat(lit("MULTIPOINT(("), px, lit(" "), py, lit("),("),
          px + 10, lit(" "), py + 10, lit("))"))
        val mpNear = concat(lit("MULTIPOINT(("), px, lit(" "), py,
          lit("),("), px / 2, lit(" "), py / 2, lit("))"))
        val box5 = lit("POLYGON((0 0,5 0,5 5,0 5,0 0))")
        val ml = concat(lit("MULTILINESTRING((0 0,"), px, lit(" "), py,
          lit("),("), px + 10, lit(" "), py + 10, lit(","), px + 11,
          lit(" "), py + 11, lit("))"))
        Tables.t(s, d, "customer")
          .select(
            k.as("c_custkey"),
            sp.stGeomFromText(mp).as("mp_wkt"),
            sp.stNumGeometries(mp).as("n_mp"),
            sp.stGeometryN(mp, lit(2)).as("second_pt"),
            sp.stGeometryType(ml).as("gt"),
            sp.stNumGeometries(ml).as("n_ml"),
            sp.stGeomFromText(lit(
              "GEOMETRYCOLLECTION(POINT(1 1),LINESTRING(0 0,1 1))"))
              .as("gc_wkt"),
            sp.stIntersects(mp, box5).as("mi"),
            sp.stContains(box5, mpNear).as("mc"),
            (sp.stGeomFromText(sp.stAsText(ml)) === ml).as("wkt_rt"),
            sp.stAsGeoJson(mp).as("gj"))
          .orderBy(k)
      },
      Some("""WITH g AS (
                SELECT c_custkey,
                       CAST(c_custkey % 10 AS DOUBLE) + 0.5 AS px,
                       CAST(c_custkey % 7 AS DOUBLE) + 0.5 AS py
                FROM customer)
              SELECT c_custkey,
                'MULTIPOINT((' || CAST(px AS VARCHAR) || ' '
                  || CAST(py AS VARCHAR) || '),(' || CAST(px + 10 AS VARCHAR)
                  || ' ' || CAST(py + 10 AS VARCHAR) || '))' AS mp_wkt,
                CAST(2 AS INTEGER) AS n_mp,
                'POINT(' || CAST(px + 10 AS VARCHAR) || ' '
                  || CAST(py + 10 AS VARCHAR) || ')' AS second_pt,
                'MULTILINESTRING' AS gt,
                CAST(2 AS INTEGER) AS n_ml,
                'GEOMETRYCOLLECTION(POINT(1 1),LINESTRING(0 0,1 1))' AS gc_wkt,
                px < 5 AND py < 5 AS mi,
                px < 5 AND py < 5 AS mc,
                TRUE AS wkt_rt,
                '{"type":"MultiPoint","coordinates":[[' || CAST(px AS VARCHAR)
                  || ',' || CAST(py AS VARCHAR) || '],['
                  || CAST(px + 10 AS VARCHAR) || ','
                  || CAST(py + 10 AS VARCHAR) || ']]}' AS gj
              FROM g ORDER BY c_custkey""")),

    // ---- SRID wave 1 (reference sql/types/geometry.go:79 SRID catalog,
    //      st_srid.go read/re-tag, x_y_latitude_longitude.go geographic
    //      accessors): the value carries its SRID, WKT text output does
    //      not; st_srid(g, n) re-tags without re-projecting, so lon/lat
    //      of a re-tagged cartesian point read back its x/y.
    QueryDef(
      "fn_spatial_srid",
      (s, d) => {
        import graft.functions.{spatial => sp}
        val k = col("c_custkey")
        val xi = (k % 10).cast("int"); val yi = (k % 7).cast("int")
        val pt = sp.stPoint(xi, yi)
        val geo = sp.stSrid(pt, lit(4326))
        Tables.t(s, d, "customer")
          .select(
            k.as("c_custkey"),
            sp.stSrid(pt).as("srid0"),
            sp.stSrid(geo).as("srid1"),
            sp.stSrid(sp.stGeomFromText(pt, lit(4326))).as("srid2"),
            sp.stAsText(geo).as("strip"),
            sp.stX(geo).as("px"),
            sp.stLongitude(geo).as("lon"),
            sp.stLatitude(geo).as("lat"),
            sp.stSrid(sp.stSrid(geo, lit(0))).as("back"))
          .orderBy(k)
      },
      Some("""WITH g AS (
                SELECT c_custkey,
                       CAST(c_custkey % 10 AS BIGINT) AS x,
                       CAST(c_custkey % 7 AS BIGINT) AS y
                FROM customer)
              SELECT c_custkey,
                CAST(0 AS INTEGER) AS srid0,
                CAST(4326 AS INTEGER) AS srid1,
                CAST(4326 AS INTEGER) AS srid2,
                'POINT(' || x || ' ' || y || ')' AS strip,
                CAST(x AS DOUBLE) AS px,
                CAST(x AS DOUBLE) AS lon,
                CAST(y AS DOUBLE) AS lat,
                CAST(0 AS INTEGER) AS back
              FROM g ORDER BY c_custkey""")),

    // ---- UUID family (registry.go uuid_to_bin/bin_to_uuid/is_uuid):
    //      deterministic md5-derived uuid text per row, validated and
    //      round-tripped through the binary forms (±swap flag)
    QueryDef(
      "fn_uuid",
      (s, d) => {
        import graft.functions.UuidFns._
        val h = md5(col("c_name").cast("binary"))
        val u = concat_ws("-",
          substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
          substring(h, 17, 4), substring(h, 21, 12))
        Tables.t(s, d, "customer")
          .select(
            col("c_custkey"),
            u.as("uuid_txt"),
            isUuid(u).as("valid"),
            isUuid(col("c_name")).as("name_valid"),
            lower(hex(uuidToBin(u))).as("bin_hex"),
            lower(hex(uuidToBin(u, swap = true))).as("bin_hex_swap"),
            binToUuid(uuidToBin(u)).as("rt"),
            binToUuid(uuidToBin(u, swap = true), swap = true).as("rt_swap"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH u AS (
                SELECT c_custkey,
                  substr(md5(c_name), 1, 8) || '-' || substr(md5(c_name), 9, 4)
                    || '-' || substr(md5(c_name), 13, 4) || '-'
                    || substr(md5(c_name), 17, 4) || '-'
                    || substr(md5(c_name), 21, 12) AS uuid_txt,
                  md5(c_name) AS h
                FROM customer)
              SELECT c_custkey, uuid_txt,
                TRUE AS valid, FALSE AS name_valid,
                h AS bin_hex,
                substr(h, 13, 4) || substr(h, 9, 4) || substr(h, 1, 8)
                  || substr(h, 17, 16) AS bin_hex_swap,
                uuid_txt AS rt, uuid_txt AS rt_swap
              FROM u ORDER BY c_custkey""")),

    // ---- cast/coercion bucket (sql/types/ conversion semantics)
    QueryDef(
      "fn_cast",
      (s, d) =>
        Tables.t(s, d, "orders")
          .select(
            col("o_orderkey"),
            col("o_orderkey").cast("string").as("key_str"),
            col("o_totalprice").cast("decimal(12,2)").cast("string").as("price_dec"),
            col("o_totalprice").cast("decimal(12,2)").cast("string").as("price_str"),
            col("o_orderdate").cast("date").as("od_date"),
            col("o_orderdate").cast("date").cast("string").as("od_str"),
            lit("42").cast("int").as("s2i"),
            lit("3.5").cast("double").as("s2d"),
            col("o_orderkey").cast("double").as("i2d"),
            (col("o_orderstatus") === "O").cast("int").as("b2i"),
            gfx.mysqlToNumber(concat(col("o_orderkey"), lit(".5x")))
              .as("mysql_prefix_num"),
            gfx.mysqlToNumber(col("o_orderpriority")).as("mysql_prio_num"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
                CAST(o_orderkey AS VARCHAR) AS key_str,
                CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,
                CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
                CAST(o_orderdate AS DATE) AS od_date,
                CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od_str,
                CAST('42' AS INT) AS s2i,
                CAST('3.5' AS DOUBLE) AS s2d,
                CAST(o_orderkey AS DOUBLE) AS i2d,
                CAST(o_orderstatus = 'O' AS INT) AS b2i,
                CAST(coalesce(nullif(regexp_extract(o_orderkey || '.5x',
                  '^[ \t]*([+-]?(?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)', 1),
                  ''), '0') AS DOUBLE) AS mysql_prefix_num,
                CAST(coalesce(nullif(regexp_extract(o_orderpriority,
                  '^[ \t]*([+-]?(?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)', 1),
                  ''), '0') AS DOUBLE) AS mysql_prio_num
              FROM orders ORDER BY o_orderkey""")),

    // ---- JSON inspection family (reference sql/expression/function/json/:
    //      json_keys/length/depth/type/valid/contains/search/quote/unquote/
    //      pretty) — native Catalyst expressions over a Jackson value model.
    //      Both engines build the identical doc string per row, so every
    //      column is data-dependent.
    QueryDef(
      "fn_json_inspect",
      (s, d) => {
        val ev = Tables.t(s, d, "events")
        val k = get_json_object(col("props"), "$.k")
        val doc = concat(
          lit("""{"id":"""), col("event_id"),
          lit(""","tags":[""""), col("event_type"),
          lit("""","t"""), col("event_id") % 5,
          lit(""""],"nested":{"k":"""), k, lit("}}"))
        ev.select(
            col("event_id"),
            gjson.jsonKeys(doc).as("keys_arr"),
            gjson.jsonLength(gjson.jsonExtract(doc, lit("$.tags")))
              .as("tags_len"),
            gjson.jsonDepth(doc).as("doc_depth"),
            gjson.jsonType(gjson.jsonExtract(doc, lit("$.nested.k")))
              .as("k_type"),
            gjson.jsonType(gjson.jsonExtract(doc, lit("$.tags")))
              .as("tags_type"),
            gjson.jsonValid(doc).as("is_valid"),
            gjson.jsonValid(substring(doc, 1, 6)).as("trunc_valid"),
            gjson.jsonContains(
              gjson.jsonExtract(doc, lit("$.tags")),
              gjson.jsonQuote(col("event_type"))).as("has_type"),
            gjson.jsonSearch(doc, lit("one"), col("event_type"))
              .as("type_path"),
            gjson.jsonUnquote(gjson.jsonExtract(doc, lit("$.tags[0]")))
              .as("tag0"),
            gjson.jsonPretty(gjson.jsonExtract(doc, lit("$.nested")))
              .as("nested_pretty"))
          .orderBy(col("event_id"))
      },
      Some("""WITH docs AS (
                SELECT event_id, event_type,
                       json_extract_string(props, '$.k') AS k,
                       '{"id":' || event_id || ',"tags":["' || event_type ||
                       '","t' || (event_id % 5) || '"],"nested":{"k":' ||
                       json_extract_string(props, '$.k') || '}}' AS doc
                FROM events)
              SELECT event_id,
                CAST(to_json(json_keys(doc)) AS VARCHAR) AS keys_arr,
                CAST(json_array_length(doc, '$.tags') AS INT) AS tags_len,
                3 AS doc_depth,
                'INTEGER' AS k_type,
                'ARRAY' AS tags_type,
                json_valid(doc) AS is_valid,
                json_valid(substr(doc, 1, 6)) AS trunc_valid,
                json_contains(json_extract(doc, '$.tags'),
                              '"' || event_type || '"') AS has_type,
                '"$.tags[0]"' AS type_path,
                event_type AS tag0,
                '{' || chr(10) || repeat(' ', 2) || '"k": ' || k || chr(10)
                  || '}' AS nested_pretty
              FROM docs ORDER BY event_id""")),

    // ---- JSON mutation family (json_set/insert/replace/remove/
    //      merge_patch/merge_preserve — MySQL create/overwrite mode rules,
    //      RFC 7396 patch semantics)
    QueryDef(
      "fn_json_mutate",
      (s, d) => {
        val ev = Tables.t(s, d, "events")
        ev.select(
            col("event_id"),
            gjson.jsonSet(col("props"), lit("$.v"), col("user_id"))
              .as("set_new"),
            gjson.jsonSet(col("props"), lit("$.k"), col("event_id"))
              .as("set_over"),
            gjson.jsonInsert(col("props"), lit("$.k"), lit(999))
              .as("ins_noop"),
            gjson.jsonInsert(col("props"), lit("$.n"), col("event_type"))
              .as("ins_new"),
            gjson.jsonReplace(col("props"), lit("$.missing"), lit(1))
              .as("repl_noop"),
            gjson.jsonReplace(col("props"), lit("$.k"), col("user_id"))
              .as("repl_over"),
            gjson.jsonRemove(
              gjson.jsonSet(col("props"), lit("$.v"), col("user_id")),
              lit("$.k")).as("removed"),
            gjson.jsonMergePatch(col("props"), lit("""{"k":null,"x":1}"""))
              .as("mpatch"),
            gjson.jsonMergePreserve(col("props"), lit("""{"k":1}"""))
              .as("mpres"))
          .orderBy(col("event_id"))
      },
      Some("""WITH docs AS (
                SELECT event_id, user_id, event_type,
                       json_extract_string(props, '$.k') AS k, props
                FROM events)
              SELECT event_id,
                '{"k":' || k || ',"v":' || user_id || '}' AS set_new,
                '{"k":' || event_id || '}' AS set_over,
                '{"k":' || k || '}' AS ins_noop,
                '{"k":' || k || ',"n":"' || event_type || '"}' AS ins_new,
                '{"k":' || k || '}' AS repl_noop,
                '{"k":' || user_id || '}' AS repl_over,
                '{"v":' || user_id || '}' AS removed,
                json_merge_patch(props, '{"k":null,"x":1}') AS mpatch,
                '{"k":[' || k || ',1]}' AS mpres
              FROM docs ORDER BY event_id""")),

    // ---- JSON constructors (reference registry.go json_array/json_object/
    //      json_value/json_array_append/json_array_insert/json_merge) via
    //      SQL TEXT — name resolution through the session registry.
    QueryDef(
      "fn_json_construct",
      (s, d) => {
        Tables.register(s, d, "events")
        new graft.Engine(s).query(
          """SELECT event_id,
               JSON_ARRAY(event_id, event_type) AS arr,
               JSON_OBJECT('id', event_id, 'type', event_type) AS obj,
               JSON_VALUE(props, '$.k') AS kval,
               JSON_ARRAY_APPEND(JSON_ARRAY(event_id), '$', event_type)
                 AS appended,
               JSON_ARRAY_INSERT(JSON_ARRAY(event_id, event_id), '$[1]', 0)
                 AS inserted,
               JSON_MERGE('[1]', '[2]') AS merged
             FROM events ORDER BY event_id""")
      },
      Some("""SELECT event_id,
                '[' || event_id || ',"' || event_type || '"]' AS arr,
                '{"id":' || event_id || ',"type":"' || event_type || '"}'
                  AS obj,
                json_extract_string(props, '$.k') AS kval,
                '[' || event_id || ',"' || event_type || '"]' AS appended,
                '[' || event_id || ',0,' || event_id || ']' AS inserted,
                '[1,2]' AS merged
              FROM events ORDER BY event_id""")),

    // ---- JSON path wildcards: `[*]`, `.*`, `**`, `[last]`, `[M to N]`,
    //      multi-path extract, and MySQL's autowrap of scalars at `[0]`
    //      (reference jsonpath dep + sql/expression/function/json/; MySQL
    //      one-vs-many rule: wildcard or multi-path results always wrap in
    //      an array). Docs are built per-row from event_id arithmetic so
    //      the oracle re-derives every expected string independently.
    QueryDef(
      "fn_json_wildcard",
      (s, d) => {
        val ev = Tables.t(s, d, "events")
        val id = col("event_id")
        val doc = concat(
          lit("""{"id":"""), id,
          lit(""","items":[{"p":"""), id % 7, lit(""","q":"""), id % 5,
          lit("""},{"p":"""), id % 3 + 10, lit(""","q":"""), id % 11,
          lit("""}],"meta":{"x":"""), id % 13,
          lit(""","y":{"p":"""), id % 9, lit("}}}"))
        ev.select(
            id,
            gjson.jsonExtract(doc, lit("$.items[*].p")).as("items_p"),
            gjson.jsonExtract(doc, lit("$.meta.*")).as("meta_vals"),
            gjson.jsonExtract(doc, lit("$**.p")).as("all_p"),
            gjson.jsonExtract(id.cast("string"), lit("$[0]")).as("scalar0"),
            gjson.jsonExtract(doc, lit("$.items[last].q")).as("last_q"),
            gjson.jsonExtract(doc, lit("$.items[0 to 1].q")).as("range_q"),
            gjson.jsonExtract(doc, lit("$.id"), lit("$.meta.x")).as("two_paths"),
            gjson.jsonContainsPath(doc, lit("all"),
              lit("$**.p"), lit("$.items[*].q")).as("has_all"),
            gjson.jsonContainsPath(doc, lit("one"),
              lit("$.items[*].zz")).as("has_missing"))
          .orderBy(id)
      },
      Some("""SELECT event_id,
                '[' || (event_id % 7) || ',' || (event_id % 3 + 10) || ']'
                  AS items_p,
                '[' || (event_id % 13) || ',{"p":' || (event_id % 9) || '}]'
                  AS meta_vals,
                '[' || (event_id % 7) || ',' || (event_id % 3 + 10) || ','
                  || (event_id % 9) || ']' AS all_p,
                CAST(event_id AS VARCHAR) AS scalar0,
                CAST(event_id % 11 AS VARCHAR) AS last_q,
                '[' || (event_id % 5) || ',' || (event_id % 11) || ']'
                  AS range_q,
                '[' || event_id || ',' || (event_id % 13) || ']' AS two_paths,
                TRUE AS has_all,
                FALSE AS has_missing
              FROM events ORDER BY event_id""")),

    // ---- JSON Schema validation (MySQL 8.0.17 json-validation
    //      functions; the reference registers but stubs them —
    //      json_unsupported.go:76,108 — implemented here for real).
    //      Per-row docs derive from event_id so the oracle can decide
    //      validity arithmetically; the report column pins MySQL's
    //      reason/location shape including first-failure ordering.
    QueryDef(
      "fn_json_schema",
      (s, d) => {
        val ev = Tables.t(s, d, "events")
        val id = col("event_id")
        val doc = concat(
          lit("""{"id":"""), id,
          lit(""","score":"""), id % 100,
          lit(""","name":"ev"""), id % 10, lit("\"}"))
        val arr = concat(lit("["), id % 3, lit(","), id % 5, lit("]"))
        val schemaObj = lit(
          """{"type":"object","required":["id","score"],"properties":{"score":{"type":"integer","minimum":20},"name":{"type":"string","pattern":"^ev[0-4]$"}}}""")
        val schemaArr = lit(
          """{"type":"array","items":{"type":"integer","maximum":3},"uniqueItems":true}""")
        ev.select(
            id,
            gjson.jsonSchemaValid(schemaObj, doc).as("ok_obj"),
            gjson.jsonSchemaValid(schemaArr, arr).as("ok_arr"),
            gjson.jsonSchemaValidationReport(schemaObj, doc).as("report"))
          .orderBy(id)
      },
      Some("""SELECT event_id,
                (event_id % 100 >= 20 AND event_id % 10 <= 4) AS ok_obj,
                (event_id % 5 <= 3 AND event_id % 3 <> event_id % 5) AS ok_arr,
                CASE
                  WHEN event_id % 100 < 20 THEN
                    '{"valid":false,"reason":"The JSON document location ''#/score'' failed requirement ''minimum'' at JSON Schema location ''#/properties/score''","schema-location":"#/properties/score","document-location":"#/score","schema-failed-keyword":"minimum"}'
                  WHEN event_id % 10 > 4 THEN
                    '{"valid":false,"reason":"The JSON document location ''#/name'' failed requirement ''pattern'' at JSON Schema location ''#/properties/name''","schema-location":"#/properties/name","document-location":"#/name","schema-failed-keyword":"pattern"}'
                  ELSE '{"valid":true}'
                END AS report
              FROM events ORDER BY event_id""")),

    // ---- session-info functions (reference registry.go: version,
    //      connection_id, user/current_user, found_rows, row_count,
    //      last_insert_id, database). An embedded analytical session has
    //      no wire connection, so these are the documented constants a
    //      client library probing `SELECT version()` expects to resolve.
    QueryDef(
      "fn_session",
      (s, d) => new graft.Engine(s).query(
        """SELECT VERSION() AS version, CONNECTION_ID() AS conn_id,
             USER() AS session_usr, CURRENT_USER() AS cur_usr,
             FOUND_ROWS() AS found_n, ROW_COUNT() AS row_n,
             LAST_INSERT_ID() AS last_id, DATABASE() AS db"""),
      Some("""SELECT '8.0.33-graft' AS version, CAST(1 AS BIGINT) AS conn_id,
                'root@localhost' AS session_usr,
                'root@localhost' AS cur_usr,
                CAST(1 AS BIGINT) AS found_n, CAST(-1 AS BIGINT) AS row_n,
                CAST(0 AS BIGINT) AS last_id, 'mydb' AS db"""))
  )
}
