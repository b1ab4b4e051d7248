package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Projection / filter / conditional / cast-ladder and the scalar
  * function families (SURVEY.md §2B "Projection" + "Scalar function
  * library").
  *
  * All expressions here are per-row and codegen'd builtins — they stay
  * inside one WholeStageCodegen span over the parquet scan, with the
  * filters and column pruning pushed into the scan itself. Per-row
  * double arithmetic is a fixed sequence of IEEE ops, so results are
  * bit-identical to the DuckDB oracle without decimal tricks (order
  * sensitivity only exists in aggregation).
  */
object Scalars {

  /** Projection, aliasing, computed columns. */
  val projCompute: QueryDef = QueryDef(
    "q_proj_compute",
    """SELECT p_partkey,
      | upper(p_brand) AS brand_uc,
      | p_retailprice * 1.1 AS price_up,
      | p_size + 100 AS size_plus,
      | concat(p_type, '/', p_brand) AS type_brand
      |FROM part""".stripMargin) { (s, dir) =>
    Tables.part(s, dir).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_uc"),
      (col("p_retailprice") * lit(1.1)).as("price_up"),
      (col("p_size") + lit(100)).as("size_plus"),
      concat(col("p_type"), lit("/"), col("p_brand")).as("type_brand"))
  }

  /** Filters: comparisons, boolean logic, IN, BETWEEN, LIKE, null
    * handling (null manufactured via nullif), null-safe equality. */
  val filterPred: QueryDef = QueryDef(
    "q_filter_pred",
    """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_totalprice BETWEEN 1000 AND 200000
      |  AND o_orderstatus IN ('O','F')
      |  AND o_orderpriority LIKE '%URGENT%'
      |  AND NOT (o_custkey < 0)
      |  AND nullif(o_orderstatus, 'X') IS NOT NULL""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .filter(col("o_totalprice").between(1000, 200000)
        && col("o_orderstatus").isin("O", "F")
        && col("o_orderpriority").like("%URGENT%")
        && !(col("o_custkey") < 0)
        && expr("nullif(o_orderstatus, 'X')").isNotNull)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
  }

  /** Null-safe equality (<=>) — Spark eqNullSafe vs DuckDB IS NOT
    * DISTINCT FROM; nulls manufactured with nullif. */
  val filterNullSafe: QueryDef = QueryDef(
    "q_filter_nullsafe",
    """SELECT o_orderkey,
      | (nullif(o_orderstatus,'P') IS NOT DISTINCT FROM nullif(o_orderstatus,'P')) AS eq_self,
      | (nullif(o_orderstatus,'P') IS NOT DISTINCT FROM 'O') AS eq_o,
      | (nullif(o_orderstatus,'P') IS NULL) AS is_p
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      expr("nullif(o_orderstatus,'P')").eqNullSafe(expr("nullif(o_orderstatus,'P')")).as("eq_self"),
      expr("nullif(o_orderstatus,'P')").eqNullSafe(lit("O")).as("eq_o"),
      expr("nullif(o_orderstatus,'P')").isNull.as("is_p"))
  }

  /** CASE WHEN / coalesce / nullif / greatest / least. */
  val condCase: QueryDef = QueryDef(
    "q_cond_case",
    """SELECT o_orderkey,
      | CASE WHEN o_totalprice < 50000 THEN 'small'
      |      WHEN o_totalprice < 150000 THEN 'medium'
      |      ELSE 'large' END AS bucket,
      | coalesce(nullif(o_orderstatus,'O'), 'open') AS status_or_open,
      | greatest(o_totalprice, 100000.0) AS at_least_100k,
      | least(CAST(o_custkey AS BIGINT), o_orderkey) AS min_key
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      when(col("o_totalprice") < 50000, "small")
        .when(col("o_totalprice") < 150000, "medium")
        .otherwise("large").as("bucket"),
      coalesce(expr("nullif(o_orderstatus,'O')"), lit("open")).as("status_or_open"),
      greatest(col("o_totalprice"), lit(100000.0)).as("at_least_100k"),
      least(col("o_custkey").cast("long"), col("o_orderkey")).as("min_key"))
  }

  /** Corrie's type-coercion ladder (SURVEY §2A-8,
    * reference writer/writer.go:250-277 makeCHArray): a JSON-ish cell
    * becomes Int64 if it parses as an integer, else Float64, else
    * passes through as a string. Expressed with an explicit
    * integer-regex so Spark and DuckDB agree (DuckDB TRY_CAST to
    * BIGINT *rounds* '1.5', Spark nulls it — regex sidesteps both). */
  val castLadder: QueryDef = QueryDef(
    "q_cast_ladder",
    """WITH cells AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE CAST(l_orderkey % 4 AS INT)
      |      WHEN 0 THEN CAST(l_orderkey AS VARCHAR)
      |      WHEN 1 THEN CAST(l_orderkey AS VARCHAR) || '.25'
      |      WHEN 2 THEN '-' || CAST(l_linenumber AS VARCHAR)
      |      ELSE 'txt_' || CAST(l_linenumber AS VARCHAR) END AS cell
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber, cell,
      |  CASE WHEN regexp_matches(cell, '^-?[0-9]+$') THEN CAST(cell AS BIGINT) END AS as_long,
      |  CASE WHEN regexp_matches(cell, '^-?[0-9]+$') THEN NULL
      |       ELSE TRY_CAST(cell AS DOUBLE) END AS as_double,
      |  CASE WHEN regexp_matches(cell, '^-?[0-9]+$') THEN 'int64'
      |       WHEN TRY_CAST(cell AS DOUBLE) IS NOT NULL THEN 'float64'
      |       ELSE 'passthrough' END AS kind
      |FROM cells""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .withColumn("cell", expr(
        """CASE CAST(l_orderkey % 4 AS INT)
          |  WHEN 0 THEN CAST(l_orderkey AS STRING)
          |  WHEN 1 THEN CAST(l_orderkey AS STRING) || '.25'
          |  WHEN 2 THEN '-' || CAST(l_linenumber AS STRING)
          |  ELSE 'txt_' || CAST(l_linenumber AS STRING) END""".stripMargin))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("cell"),
        expr("CASE WHEN cell RLIKE '^-?[0-9]+$' THEN CAST(cell AS BIGINT) END").as("as_long"),
        expr("CASE WHEN cell RLIKE '^-?[0-9]+$' THEN NULL ELSE TRY_CAST(cell AS DOUBLE) END").as("as_double"),
        expr("""CASE WHEN cell RLIKE '^-?[0-9]+$' THEN 'int64'
                |WHEN TRY_CAST(cell AS DOUBLE) IS NOT NULL THEN 'float64'
                |ELSE 'passthrough' END""".stripMargin).as("kind"))
  }

  /** String function family. */
  val strFuncs: QueryDef = QueryDef(
    "q_str_funcs",
    """SELECT c_custkey,
      | concat(c_name, ':', c_mktsegment) AS cat,
      | substr(c_name, 1, 8) AS name8,
      | upper(c_mktsegment) AS seg_uc,
      | lower(c_name) AS name_lc,
      | trim('  ' || c_mktsegment || ' ') AS trimmed,
      | CAST(length(c_name) AS BIGINT) AS name_len,
      | CAST(len(string_split(c_name, '#')) AS BIGINT) AS n_parts,
      | regexp_extract(c_name, '([0-9]+)', 1) AS name_num,
      | regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
      | lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad,
      | CAST(instr(c_name, '0') AS BIGINT) AS zero_at,
      | (c_mktsegment LIKE 'BU%') AS is_building
      |FROM customer""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir).select(
      col("c_custkey"),
      concat(col("c_name"), lit(":"), col("c_mktsegment")).as("cat"),
      substring(col("c_name"), 1, 8).as("name8"),
      upper(col("c_mktsegment")).as("seg_uc"),
      lower(col("c_name")).as("name_lc"),
      trim(concat(lit("  "), col("c_mktsegment"), lit(" "))).as("trimmed"),
      length(col("c_name")).cast("long").as("name_len"),
      size(split(col("c_name"), "#")).cast("long").as("n_parts"),
      regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_num"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
      lpad(col("c_custkey").cast("string"), 8, "0").as("key_pad"),
      instr(col("c_name"), "0").cast("long").as("zero_at"),
      col("c_mktsegment").like("BU%").as("is_building"))
  }

  /** Date/time function family (session TZ = UTC both engines). */
  val dateFuncs: QueryDef = QueryDef(
    "q_date_funcs",
    """SELECT o_orderkey,
      | CAST(year(o_orderdate) AS BIGINT) AS y,
      | CAST(month(o_orderdate) AS BIGINT) AS m,
      | CAST(day(o_orderdate) AS BIGINT) AS d,
      | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      | CAST(o_orderdate AS DATE) + 30 AS plus30,
      | CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
      | CAST(o_orderdate AS DATE) AS od,
      | CAST(floor(epoch(o_orderdate)) AS BIGINT) AS unix_ts
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("m"),
      dayofmonth(col("o_orderdate")).cast("long").as("d"),
      date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
      date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
        .cast("long").as("days_since"),
      col("o_orderdate").cast("date").as("od"),
      unix_timestamp(col("o_orderdate")).as("unix_ts"))
  }

  /** Second date/time family: last_day, month arithmetic (both
    * engines clamp end-of-month), quarter, ISO day-of-week (Spark
    * weekday+1 == DuckDB isodow), ISO week, formatting. */
  val dateFuncs2: QueryDef = QueryDef(
    "q_date_funcs2",
    """SELECT o_orderkey,
      | last_day(CAST(o_orderdate AS DATE)) AS eom,
      | CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
      | CAST(quarter(o_orderdate) AS INT) AS qtr,
      | CAST(isodow(o_orderdate) AS INT) AS iso_dow,
      | CAST(week(o_orderdate) AS INT) AS iso_week,
      | strftime(o_orderdate, '%Y-%m-%d') AS fmt
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      last_day(col("o_orderdate").cast("date")).as("eom"),
      add_months(col("o_orderdate").cast("date"), 1).as("next_month"),
      quarter(col("o_orderdate")).cast("int").as("qtr"),
      (weekday(col("o_orderdate")) + 1).cast("int").as("iso_dow"),
      weekofyear(col("o_orderdate")).cast("int").as("iso_week"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"))
  }

  /** Math function family. ln() output rounded to 6 decimals (libm
    * last-ulp differences between JVM and glibc). */
  val mathFuncs: QueryDef = QueryDef(
    "q_math_funcs",
    """SELECT p_partkey,
      | floor(p_retailprice * 100 / 7 + 0.5) / 100 AS div_round,
      | CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      | CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
      | abs(p_size - 25) AS size_dev,
      | p_retailprice * p_retailprice AS price_sq,
      | sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
      | round(ln(p_retailprice), 6) AS price_ln,
      | ((p_partkey % 7) + 7) % 7 AS key_mod7,
      | CAST(sign(p_size - 25) AS DOUBLE) AS size_sign
      |FROM part""".stripMargin) { (s, dir) =>
    Tables.part(s, dir).select(
      col("p_partkey"),
      expr("floor(p_retailprice * 100 / 7 + 0.5) / 100").as("div_round"),
      floor(col("p_retailprice")).cast("long").as("price_floor"),
      ceil(col("p_retailprice")).cast("long").as("price_ceil"),
      abs(col("p_size") - 25).as("size_dev"),
      (col("p_retailprice") * col("p_retailprice")).as("price_sq"),
      sqrt(col("p_size").cast("double")).as("size_sqrt"),
      round(log(col("p_retailprice")), 6).as("price_ln"),
      pmod(col("p_partkey"), lit(7)).as("key_mod7"),
      signum(col("p_size") - 25).cast("double").as("size_sign"))
  }

  /** Array / higher-order function family over embeddings.embedding
    * (array<float>). Dot products fold sequentially in both engines
    * (Spark aggregate == DuckDB list_reduce) over doubles, so FP
    * results are bit-identical. Array-typed outputs are serialized to
    * comma-joined strings via a DECIMAL(20,6) format (scale-padded
    * identically in both engines) — the driver's row comparator can't
    * hash raw array cells. */
  val arrayFuncs: QueryDef = QueryDef(
    "q_array_funcs",
    """SELECT vec_id,
      | CAST(len(embedding) AS BIGINT) AS dims,
      | CAST(embedding[1] AS DOUBLE) AS first_dim,
      | array_to_string(list_transform(embedding[1:4], x -> CAST(CAST(round(CAST(x AS DOUBLE) * 2, 6) AS DECIMAL(20,6)) AS VARCHAR)), ',') AS head_x2,
      | CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
      | list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (a, x) -> a + x) AS vec_sum,
      | array_to_string(list_transform(list_sort(list_transform(embedding[1:2], x -> CAST(x AS DOUBLE))), x -> CAST(CAST(round(x, 6) AS DECIMAL(20,6)) AS VARCHAR)), ',') AS head_sorted,
      | list_contains(range(1, CAST(label AS BIGINT) + 2), 3) AS label_has_3,
      | CAST(len(list_distinct([label % 2, label % 3, label % 2])) AS BIGINT) AS n_distinct_mods
      |FROM embeddings""".stripMargin) { (s, dir) =>
    Tables.embeddings(s, dir).select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dims"),
      element_at(col("embedding"), 1).cast("double").as("first_dim"),
      expr("array_join(transform(slice(embedding, 1, 4), x -> CAST(CAST(round(CAST(x AS DOUBLE) * 2, 6) AS DECIMAL(20,6)) AS STRING)), ',')").as("head_x2"),
      expr("size(filter(embedding, x -> x > 0))").cast("long").as("n_pos"),
      expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a, x) -> a + x)").as("vec_sum"),
      expr("array_join(transform(sort_array(transform(slice(embedding, 1, 2), x -> CAST(x AS DOUBLE))), x -> CAST(CAST(round(x, 6) AS DECIMAL(20,6)) AS STRING)), ',')").as("head_sorted"),
      expr("array_contains(sequence(1L, CAST(label AS BIGINT) + 1), 3L)").as("label_has_3"),
      expr("size(array_distinct(array(label % 2, label % 3, label % 2)))").cast("long").as("n_distinct_mods"))
  }

  /** Map functions — maps built per-row, key/value arrays emitted as
    * comma-joined strings (map column ordering is engine-dependent and
    * the driver's row comparator can't hash raw array cells). Null
    * event_type is placeholder-replaced before the join so both engines
    * serialize it identically. */
  val mapFuncs: QueryDef = QueryDef(
    "q_map_funcs",
    """SELECT event_id,
      | array_to_string(map_keys(MAP {'type': coalesce(event_type, '<null>'), 'uid': CAST(user_id AS VARCHAR)}), ',') AS ks,
      | array_to_string(map_values(MAP {'type': coalesce(event_type, '<null>'), 'uid': CAST(user_id AS VARCHAR)}), ',') AS vs,
      | element_at(MAP {'type': event_type}, 'type')[1] AS type_val
      |FROM events""".stripMargin) { (s, dir) =>
    Tables.events(s, dir).select(
      col("event_id"),
      array_join(map_keys(map(lit("type"), coalesce(col("event_type"), lit("<null>")),
        lit("uid"), col("user_id").cast("string"))), ",").as("ks"),
      array_join(map_values(map(lit("type"), coalesce(col("event_type"), lit("<null>")),
        lit("uid"), col("user_id").cast("string"))), ",").as("vs"),
      element_at(map(lit("type"), col("event_type")), "type").as("type_val"))
  }

  /** JSON function family over events.props. */
  val jsonFuncs: QueryDef = QueryDef(
    "q_json_funcs",
    """SELECT event_id,
      | json_extract_string(props, '$.k') AS k_str,
      | CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
      | to_json({'k': coalesce(CAST(json_extract_string(props, '$.k') AS INT), -1)}) AS rt,
      | json_extract_string(props, '$.missing') AS missing
      |FROM events""".stripMargin) { (s, dir) =>
    Tables.events(s, dir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast("int").as("k_int"),
      to_json(struct(coalesce(get_json_object(col("props"), "$.k").cast("int"), lit(-1))
        .as("k"))).as("rt"),
      get_json_object(col("props"), "$.missing").as("missing"))
  }

  /** Extended string family: edit distance, reverse/repeat/translate. */
  val strFuncs2: QueryDef = QueryDef(
    "q_str_funcs2",
    """SELECT s_suppkey,
      | CAST(levenshtein(s_name, 'Supplier#000000001') AS INT) AS edit_dist,
      | reverse(s_name) AS name_rev,
      | repeat(CAST(s_nationkey AS VARCHAR), 3) AS nk3,
      | translate(s_name, '#0', '_x') AS name_tr
      |FROM supplier""".stripMargin) { (s, dir) =>
    Tables.supplier(s, dir).select(
      col("s_suppkey"),
      levenshtein(col("s_name"), lit("Supplier#000000001")).cast("int").as("edit_dist"),
      reverse(col("s_name")).as("name_rev"),
      repeat(col("s_nationkey").cast("string"), 3).as("nk3"),
      translate(col("s_name"), "#0", "_x").as("name_tr"))
  }

  /** Bitwise family (DuckDB spells xor as a function, Spark as ^). */
  val bitFuncs: QueryDef = QueryDef(
    "q_bit_funcs",
    """SELECT o_orderkey,
      | o_orderkey & 255 AS and_mask,
      | o_orderkey | 4096 AS or_mask,
      | xor(o_orderkey, o_custkey) AS xored,
      | CAST(o_custkey AS BIGINT) << 4 AS shifted_l,
      | o_orderkey >> 2 AS shifted_r
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      expr("o_orderkey & 255").as("and_mask"),
      expr("o_orderkey | 4096").as("or_mask"),
      expr("o_orderkey ^ o_custkey").as("xored"),
      expr("shiftleft(CAST(o_custkey AS BIGINT), 4)").as("shifted_l"),
      expr("shiftright(o_orderkey, 2)").as("shifted_r"))
  }

  /** More array ops: flatten, position, overlap. The bigint array is
    * serialized comma-joined (driver comparator can't hash array cells). */
  val arrayFuncs2: QueryDef = QueryDef(
    "q_array_funcs2",
    """SELECT vec_id,
      | array_to_string(flatten([range(0, CAST(label AS BIGINT) + 1), [100, 200]]), ',') AS flat,
      | CAST(list_position(range(0, 5), CAST(label AS BIGINT)) AS INT) AS label_pos,
      | len(list_intersect(range(0, CAST(label AS BIGINT) + 1), range(3, 8))) > 0 AS overlaps
      |FROM embeddings""".stripMargin) { (s, dir) =>
    Tables.embeddings(s, dir).select(
      col("vec_id"),
      expr("array_join(transform(flatten(array(sequence(0L, CAST(label AS BIGINT)), array(100L, 200L))), x -> CAST(x AS STRING)), ',')").as("flat"),
      expr("array_position(sequence(0L, 4L), CAST(label AS BIGINT))").cast("int").as("label_pos"),
      expr("arrays_overlap(sequence(0L, CAST(label AS BIGINT)), sequence(3L, 7L))").as("overlaps"))
  }

  /** Null-preserving explode (explode_outer): rows with empty arrays
    * survive with a null element. */
  val explodeOuter: QueryDef = QueryDef(
    "q_explode_outer",
    """SELECT vec_id, e FROM (
      |  SELECT vec_id,
      |    CASE WHEN label % 3 = 0 THEN [] ELSE range(0, CAST(label AS BIGINT)) END AS l
      |  FROM embeddings) t
      |LEFT JOIN LATERAL (SELECT unnest(l) AS e) ON TRUE""".stripMargin) { (s, dir) =>
    Tables.embeddings(s, dir)
      .withColumn("l", expr(
        "CASE WHEN label % 3 = 0 THEN array() ELSE sequence(0L, CAST(label AS BIGINT) - 1) END"))
      .select(col("vec_id"), explode_outer(col("l")).as("e"))
  }

  /** Third string family: case/format/affix tests (DuckDB lacks
    * initcap — the single-word names make upper-first+lower-rest an
    * exact emulation). */
  val strFuncs3: QueryDef = QueryDef(
    "q_str_funcs3",
    """SELECT c_custkey,
      | upper(substr(lower(c_name), 1, 1)) || lower(substr(lower(c_name), 2)) AS name_cap,
      | split_part(c_name, '#', 1) AS name_head,
      | CAST(ascii(c_mktsegment) AS INT) AS seg_ascii,
      | chr(CAST(65 + c_custkey % 26 AS INT)) AS key_chr,
      | printf('%05d|%s', c_custkey, c_mktsegment) AS formatted,
      | starts_with(c_name, 'Customer') AS is_customer,
      | ends_with(c_mktsegment, 'RY') AS seg_ry,
      | contains(c_name, '00') AS has_00,
      | CAST(len(regexp_extract_all(c_name, '0')) AS INT) AS n_zeros,
      | left(c_name, 5) AS name_l5,
      | right(c_name, 3) AS name_r3
      |FROM customer""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir).select(
      col("c_custkey"),
      initcap(lower(col("c_name"))).as("name_cap"),
      substring_index(col("c_name"), "#", 1).as("name_head"),
      ascii(col("c_mktsegment")).cast("int").as("seg_ascii"),
      expr("char(65 + c_custkey % 26)").as("key_chr"),
      format_string("%05d|%s", col("c_custkey"), col("c_mktsegment")).as("formatted"),
      expr("startswith(c_name, 'Customer')").as("is_customer"),
      expr("endswith(c_mktsegment, 'RY')").as("seg_ry"),
      expr("contains(c_name, '00')").as("has_00"),
      expr("regexp_count(c_name, '0')").cast("int").as("n_zeros"),
      expr("left(c_name, 5)").as("name_l5"),
      expr("right(c_name, 3)").as("name_r3"))
  }

  /** Third array family: zip_with and the set algebra
    * (union/except/remove/repeat) plus array_max/min; array outputs are
    * comma-serialized (integers format identically in both engines). */
  val arrayFuncs3: QueryDef = QueryDef(
    "q_array_funcs3",
    """SELECT vec_id,
      | array_to_string(list_transform(range(1, 5), i -> CAST((i + label) * ((5 - i) + label) AS VARCHAR)), ',') AS zipped,
      | array_to_string(list_transform(list_sort(list_distinct(range(0, CAST(label AS BIGINT) + 1) || range(2, 6))), x -> CAST(x AS VARCHAR)), ',') AS unioned,
      | coalesce(array_to_string(list_transform(list_filter(range(0, 6), x -> x > label), x -> CAST(x AS VARCHAR)), ','), '') AS excepted,
      | coalesce(array_to_string(list_transform(list_filter([CAST(1 AS BIGINT), CAST(label AS BIGINT), 3, CAST(label AS BIGINT)], x -> x != label), x -> CAST(x AS VARCHAR)), ','), '') AS removed,
      | array_to_string([CAST(label AS VARCHAR), CAST(label AS VARCHAR), CAST(label AS VARCHAR)], ',') AS repeated,
      | CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS emb_max,
      | CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS emb_min
      |FROM embeddings""".stripMargin) { (s, dir) =>
    Tables.embeddings(s, dir).select(
      col("vec_id"),
      expr("""array_join(transform(zip_with(transform(sequence(1, 4), i -> i + label),
             |  reverse(transform(sequence(1, 4), i -> i + label)),
             |  (x, y) -> x * y), v -> CAST(v AS STRING)), ',')""".stripMargin).as("zipped"),
      expr("""array_join(transform(sort_array(array_union(
             |  sequence(0L, CAST(label AS BIGINT)), sequence(2L, 5L))),
             |  x -> CAST(x AS STRING)), ',')""".stripMargin).as("unioned"),
      expr("""array_join(transform(sort_array(array_except(
             |  sequence(0L, 5L), sequence(0L, CAST(label AS BIGINT)))),
             |  x -> CAST(x AS STRING)), ',')""".stripMargin).as("excepted"),
      expr("""array_join(transform(array_remove(
             |  array(1L, CAST(label AS BIGINT), 3L, CAST(label AS BIGINT)), CAST(label AS BIGINT)),
             |  x -> CAST(x AS STRING)), ',')""".stripMargin).as("removed"),
      expr("array_join(array_repeat(CAST(label AS STRING), 3), ',')").as("repeated"),
      expr("CAST(array_max(embedding) AS DOUBLE)").as("emb_max"),
      expr("CAST(array_min(embedding) AS DOUBLE)").as("emb_min"))
  }

  /** Second map family: transform_values / map_filter / map_concat,
    * serialized as sorted `k=v` entry strings. The DuckDB oracle
    * computes the same entries arithmetically (its map surface has no
    * higher-order transforms). */
  val mapFuncs2: QueryDef = QueryDef(
    "q_map_funcs2",
    """SELECT vec_id,
      | 'a=' || CAST(2 * (label + 1) AS VARCHAR) || ',b=' || CAST(2 * (2 * label + 1) AS VARCHAR) AS doubled,
      | CASE WHEN (label + 1) % 2 = 1
      |      THEN 'a=' || CAST(label + 1 AS VARCHAR) || ',b=' || CAST(2 * label + 1 AS VARCHAR)
      |      ELSE 'b=' || CAST(2 * label + 1 AS VARCHAR) END AS odd_only,
      | 'a=' || CAST(label AS VARCHAR) || ',c=7' AS concatted
      |FROM embeddings""".stripMargin) { (s, dir) =>
    def ser(m: String) =
      s"array_join(sort_array(transform(map_entries($m), e -> concat(e.key, '=', CAST(e.value AS STRING)))), ',')"
    Tables.embeddings(s, dir)
      .withColumn("m", expr("map('a', label + 1, 'b', 2 * label + 1)"))
      .select(
        col("vec_id"),
        expr(ser("transform_values(m, (k, v) -> v * 2)")).as("doubled"),
        expr(ser("map_filter(m, (k, v) -> v % 2 = 1)")).as("odd_only"),
        expr(ser("map_concat(map('a', label), map('c', 7))")).as("concatted"))
  }

  /** Third map family: transform_keys, map_zip_with, str_to_map —
    * DuckDB has no higher-order map functions, so (as with family 2)
    * the oracle computes the expected serialized strings
    * arithmetically; the Spark side must produce identical
    * serializations through the real map operators. */
  val mapFuncs3: QueryDef = QueryDef(
    "q_map_funcs3",
    """SELECT vec_id,
      | 'A=' || CAST(label + 1 AS VARCHAR) || ',B=' || CAST(label + 2 AS VARCHAR) AS upper_keys,
      | 'a=' || CAST(10 * (label + 1) AS VARCHAR) || ',b=' || CAST(20 * (label + 2) AS VARCHAR) AS zipped,
      | 'x=' || CAST(label AS VARCHAR) || ',y=7' AS parsed
      |FROM embeddings""".stripMargin) { (s, dir) =>
    def ser(m: String) =
      s"array_join(sort_array(transform(map_entries($m), e -> concat(e.key, '=', CAST(e.value AS STRING)))), ',')"
    Tables.embeddings(s, dir)
      .withColumn("m", expr("map('a', label + 1, 'b', label + 2)"))
      .select(
        col("vec_id"),
        expr(ser("transform_keys(m, (k, v) -> upper(k))")).as("upper_keys"),
        expr(ser("map_zip_with(m, map('a', 10, 'b', 20), (k, v1, v2) -> v1 * v2)")).as("zipped"),
        expr(ser("str_to_map(concat('x:', CAST(label AS STRING), ',y:7'), ',', ':')")).as("parsed"))
  }

  /** Second math family: trig / inverse-trig / exp / log bases /
    * angle conversion — all libm outputs, so rounded to 6 decimals per
    * the determinism policy (DuckDB has no hyperbolics; omitted). */
  val mathFuncs2: QueryDef = QueryDef(
    "q_math_funcs2",
    """SELECT p_partkey,
      | round(sin(p_size * 0.1), 6) AS sin_v,
      | round(cos(p_size * 0.1), 6) AS cos_v,
      | round(tan(p_size * 0.1), 6) AS tan_v,
      | round(asin(p_size / 100.0), 6) AS asin_v,
      | round(atan2(CAST(p_size AS DOUBLE), 10.0), 6) AS atan2_v,
      | round(exp(p_size * 0.05), 6) AS exp_v,
      | round(log10(p_retailprice), 6) AS log10_v,
      | round(log2(CAST(p_size AS DOUBLE)), 6) AS log2_v,
      | round(degrees(p_size * 0.01), 6) AS deg_v,
      | round(radians(CAST(p_size AS DOUBLE)), 6) AS rad_v,
      | round(cbrt(p_retailprice), 6) AS cbrt_v
      |FROM part""".stripMargin) { (s, dir) =>
    Tables.part(s, dir).select(
      col("p_partkey"),
      round(sin(col("p_size") * 0.1), 6).as("sin_v"),
      round(cos(col("p_size") * 0.1), 6).as("cos_v"),
      round(tan(col("p_size") * 0.1), 6).as("tan_v"),
      round(asin(col("p_size") / 100.0), 6).as("asin_v"),
      round(atan2(col("p_size").cast("double"), lit(10.0)), 6).as("atan2_v"),
      round(exp(col("p_size") * 0.05), 6).as("exp_v"),
      round(log10(col("p_retailprice")), 6).as("log10_v"),
      round(log2(col("p_size").cast("double")), 6).as("log2_v"),
      round(degrees(col("p_size") * 0.01), 6).as("deg_v"),
      round(radians(col("p_size").cast("double")), 6).as("rad_v"),
      round(cbrt(col("p_retailprice")), 6).as("cbrt_v"))
  }

  /** Third date family: make_date, day-of-year, ISO week truncation,
    * day names, whole-month diff (Spark's months_between is fractional,
    * so the month count is computed arithmetically to match DuckDB's
    * boundary-crossing date_diff). */
  val dateFuncs3: QueryDef = QueryDef(
    "q_date_funcs3",
    """SELECT o_orderkey,
      | make_date(2020, CAST(month(o_orderdate) AS INT), 15) AS md,
      | CAST(dayofyear(o_orderdate) AS INT) AS doy,
      | CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
      | dayname(o_orderdate) AS dname,
      | CAST(date_diff('month', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS months_since
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      expr("make_date(2020, CAST(month(o_orderdate) AS INT), 15)").as("md"),
      dayofyear(col("o_orderdate")).cast("int").as("doy"),
      date_trunc("week", col("o_orderdate")).cast("date").as("week_start"),
      date_format(col("o_orderdate"), "EEEE").as("dname"),
      ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
        .cast("int").as("months_since"))
  }

  /** Regex family: extract-all (serialized), full-match test, and
    * backreference replace (Java `$n` vs RE2 `\n` syntax, same
    * semantics). */
  val regexFuncs: QueryDef = QueryDef(
    "q_regex_funcs",
    """SELECT c_custkey,
      | array_to_string(regexp_extract_all(c_name, '[0-9]+'), ',') AS nums,
      | regexp_matches(c_name, '^Customer#[0-9]+$') AS well_formed,
      | regexp_replace(c_name, '([0-9])([0-9])$', '\2\1', 'g') AS swapped,
      | regexp_extract(c_name, 'Customer#0*([1-9][0-9]*)', 1) AS key_str
      |FROM customer""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir).select(
      col("c_custkey"),
      expr("array_join(regexp_extract_all(c_name, '[0-9]+', 0), ',')").as("nums"),
      col("c_name").rlike("^Customer#[0-9]+$").as("well_formed"),
      regexp_replace(col("c_name"), "([0-9])([0-9])$", "$2$1").as("swapped"),
      regexp_extract(col("c_name"), "Customer#0*([1-9][0-9]*)", 1).as("key_str"))
  }

  /** posexplode: generator with element ordinals (0-based in Spark;
    * the oracle reconstructs positions with unnest-over-range). */
  val posExplode: QueryDef = QueryDef(
    "q_posexplode",
    """WITH p AS (SELECT s_suppkey, string_split(s_name, '#') AS parts FROM supplier)
      |SELECT s_suppkey, CAST(i - 1 AS INT) AS pos, parts[CAST(i AS INT)] AS word
      |FROM p, unnest(range(1, len(parts) + 1)) AS t(i)""".stripMargin) { (s, dir) =>
    Tables.supplier(s, dir)
      .select(col("s_suppkey"),
        posexplode(split(col("s_name"), "#")).as(Seq("pos", "word")))
  }

  /** Binary family: string↔binary encode/decode, base64 round trip,
    * hex (lowercased — Spark emits uppercase digits, DuckDB lower),
    * byte/bit lengths. */
  val binaryFuncs: QueryDef = QueryDef(
    "q_binary_funcs",
    """SELECT s_suppkey,
      | base64(encode(s_name)) AS b64,
      | decode(from_base64(base64(encode(s_name)))) AS rt,
      | lower(hex(encode(s_name))) AS hx,
      | decode(unhex(hex(encode(s_name)))) AS hex_rt,
      | CAST(octet_length(encode(s_name)) AS INT) AS n_bytes,
      | CAST(bit_length(s_name) AS INT) AS n_bits
      |FROM supplier""".stripMargin) { (s, dir) =>
    Tables.supplier(s, dir).select(
      col("s_suppkey"),
      base64(expr("encode(s_name, 'UTF-8')")).as("b64"),
      expr("decode(unbase64(base64(encode(s_name, 'UTF-8'))), 'UTF-8')").as("rt"),
      lower(hex(expr("encode(s_name, 'UTF-8')"))).as("hx"),
      expr("decode(unhex(hex(encode(s_name, 'UTF-8'))), 'UTF-8')").as("hex_rt"),
      expr("octet_length(s_name)").cast("int").as("n_bytes"),
      expr("bit_length(s_name)").cast("int").as("n_bits"))
  }

  /** Null-handling family over the nullable event_type column:
    * nvl / nvl2 / ifnull / null-safe comparison. */
  val nullFuncs: QueryDef = QueryDef(
    "q_null_funcs",
    """SELECT event_id,
      | coalesce(event_type, '<none>') AS type_or_none,
      | CASE WHEN event_type IS NOT NULL THEN 'present' ELSE 'absent' END AS presence,
      | ifnull(event_type, '?') AS type_or_q,
      | (event_type IS NOT DISTINCT FROM 'click') AS is_click
      |FROM events""".stripMargin) { (s, dir) =>
    Tables.events(s, dir).select(
      col("event_id"),
      expr("nvl(event_type, '<none>')").as("type_or_none"),
      expr("nvl2(event_type, 'present', 'absent')").as("presence"),
      expr("ifnull(event_type, '?')").as("type_or_q"),
      expr("equal_null(event_type, 'click')").as("is_click"))
  }

  /** Spark 4 VARIANT shredding: build a nested JSON envelope, parse it
    * ONCE into a binary `variant` column, then extract typed paths with
    * `variant_get` (no re-parse per path — the Spark-4 answer to the
    * from_json CSE trap in CLAUDE.md). Oracle extracts the same paths
    * from the same JSON text with DuckDB's JSON functions. Doubles ride
    * the repo policy (round 6 dp → DOUBLE). */
  val variantShred: QueryDef = QueryDef(
    "q_variant_shred",
    """WITH j AS (SELECT l_orderkey, l_linenumber,
      |  to_json({'qty': CAST(l_quantity AS BIGINT),
      |           'flags': {'ret': l_returnflag, 'ls': l_linestatus},
      |           'price': l_extendedprice}) AS doc
      | FROM lineitem WHERE l_orderkey % 7 = 0)
      |SELECT l_orderkey, l_linenumber,
      | CAST(json_extract_string(doc, '$.qty') AS BIGINT) AS qty,
      | json_extract_string(doc, '$.flags.ret') AS ret,
      | json_extract_string(doc, '$.flags.ls') AS ls,
      | CAST(round(CAST(json_extract_string(doc, '$.price') AS DOUBLE), 6) AS DOUBLE) AS price,
      | json_extract_string(doc, '$.missing') AS missing
      |FROM j""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        parse_json(to_json(struct(
          col("l_quantity").cast("bigint").as("qty"),
          struct(col("l_returnflag").as("ret"), col("l_linestatus").as("ls")).as("flags"),
          col("l_extendedprice").as("price")))).as("v"))
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("variant_get(v, '$.qty', 'bigint')").as("qty"),
        expr("variant_get(v, '$.flags.ret', 'string')").as("ret"),
        expr("variant_get(v, '$.flags.ls', 'string')").as("ls"),
        round(expr("variant_get(v, '$.price', 'double')"), 6).cast("double").as("price"),
        expr("try_variant_get(v, '$.missing', 'string')").as("missing"))
  }

  val defs: Seq[QueryDef] = Seq(
    projCompute, filterPred, filterNullSafe, condCase, castLadder,
    strFuncs, dateFuncs, mathFuncs, arrayFuncs, mapFuncs, jsonFuncs,
    strFuncs2, bitFuncs, arrayFuncs2, dateFuncs2, explodeOuter,
    strFuncs3, arrayFuncs3, mapFuncs2, mapFuncs3, mathFuncs2, dateFuncs3,
    regexFuncs, posExplode, binaryFuncs, nullFuncs, variantShred)
}
