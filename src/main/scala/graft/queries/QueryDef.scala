package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator-exercising query: the Spark-side plan builder
  * plus (when SQL-expressible) the equivalent DuckDB SQL the driver runs
  * as the differential oracle (SURVEY.md §2.11, §5.2 t2).
  *
  * Conventions (required for cross-engine hash-matching):
  *  - total ORDER BY on a unique key;
  *  - float aggregates ROUNDed; money/qty SUMs accumulate in
  *    DECIMAL(18,6) on BOTH engines (order-independent, exact) and are
  *    cast back to DOUBLE so output schemas agree;
  *  - COUNTs are BIGINT on both sides;
  *  - column names identical on both sides (driver sorts columns by
  *    name before hashing).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)
