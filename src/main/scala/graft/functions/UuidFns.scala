package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** UUID function family — reference registry.go uuid/is_uuid/uuid_to_bin/
  * bin_to_uuid. Pure compositions of codegen'd built-ins (no custom
  * expression needed): validation is a regex, the binary forms are
  * hex/unhex reshuffles. The swap flag follows MySQL 8's time-swap layout
  * (time-high, time-mid, time-low first, for index locality). */
object UuidFns {

  private val UuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  def isUuid(c: Column): Column = c.rlike(UuidRe)

  private def clean(c: Column): Column = lower(regexp_replace(c, "-", ""))

  /** UUID_TO_BIN(u [, swap]) -> BINARY(16). */
  def uuidToBin(c: Column, swap: Boolean = false): Column = {
    val h = clean(c)
    val reordered =
      if (!swap) h
      else concat(substring(h, 13, 4), substring(h, 9, 4),
        substring(h, 1, 8), substring(h, 17, 16))
    unhex(reordered)
  }

  /** BIN_TO_UUID(b [, swap]) -> canonical lowercase text form. */
  def binToUuid(b: Column, swap: Boolean = false): Column = {
    val h0 = lower(hex(b))
    val h =
      if (!swap) h0
      else concat(substring(h0, 9, 8), substring(h0, 5, 4),
        substring(h0, 1, 4), substring(h0, 17, 16))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }
}
