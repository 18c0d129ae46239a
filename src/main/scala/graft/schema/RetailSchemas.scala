package graft.schema

import org.apache.spark.sql.types._

/** Explicit `StructType`s for the reference's 5-table retail star
  * schema, mirrored field-for-field from the authoritative Snowflake
  * DDL (reference: Snow Flake/Data Ingestion.sql:20-112; column lists
  * reproduced in FIXTURES.md §A).
  *
  * The reference reads its CSVs with `inferSchema=True` (reference:
  * Data Transformation.py:34), which (a) costs one extra full scan per
  * file and (b) degrades every NUMERIC(38,2) to double. We declare the
  * schema instead: single scan, and the money/qty columns come in as
  * `DoubleType` ON PURPOSE — that is the type the reference's own
  * engine computed with, so faithful-mode results are bit-compatible.
  * `ddl*` variants carry the exact Snowflake decimal types for users
  * who want DDL fidelity over reference-runtime fidelity.
  *
  * At 100 TB the explicit schema is not a style choice: schema
  * inference reads every byte of every input once before the job even
  * starts.
  */
object RetailSchemas {

  private def money(name: String) = StructField(name, DoubleType)
  private def moneyDdl(name: String) = StructField(name, DecimalType(38, 2))

  /** sales fact — Data Ingestion.sql:48-61. */
  val sales: StructType = StructType(Seq(
    StructField("trans_id", IntegerType),
    StructField("prod_key", IntegerType),
    StructField("store_key", IntegerType),
    StructField("trans_dt", DateType),
    StructField("trans_time", IntegerType),
    money("sales_qty"), money("sales_price"), money("sales_amt"),
    money("discount"), money("sales_cost"), money("sales_mgrn"),
    money("ship_cost")))

  /** inventory fact — Data Ingestion.sql:102-112. */
  val inventory: StructType = StructType(Seq(
    StructField("cal_dt", DateType),
    StructField("store_key", IntegerType),
    StructField("prod_key", IntegerType),
    money("inventory_on_hand_qty"), money("inventory_on_order_qty"),
    StructField("out_of_stock_flg", IntegerType),
    money("waste_qty"),
    StructField("promotion_flg", BooleanType),
    StructField("next_delivery_dt", DateType)))

  /** calendar dim — Data Ingestion.sql:66-79. */
  val calendar: StructType = StructType(Seq(
    StructField("cal_dt", DateType, nullable = false),
    StructField("cal_type_desc", StringType),
    StructField("day_of_wk_num", StringType),
    StructField("day_of_wk_desc", StringType),
    StructField("yr_num", IntegerType),
    StructField("wk_num", IntegerType),
    StructField("yr_wk_num", IntegerType),
    StructField("mnth_num", IntegerType),
    StructField("yr_mnth_num", IntegerType),
    StructField("qtr_num", IntegerType),
    StructField("yr_qtr_num", IntegerType)))

  /** store dim — Data Ingestion.sql:20-43. */
  val store: StructType = StructType(Seq(
    StructField("store_key", IntegerType),
    StructField("store_num", StringType),
    StructField("store_desc", StringType),
    StructField("addr", StringType),
    StructField("city", StringType),
    StructField("region", StringType),
    StructField("cntry_cd", StringType),
    StructField("cntry_nm", StringType),
    StructField("postal_zip_cd", StringType),
    StructField("prov_state_desc", StringType),
    StructField("prov_state_cd", StringType),
    StructField("store_type_cd", StringType),
    StructField("store_type_desc", StringType),
    StructField("frnchs_flg", BooleanType),
    StructField("store_size", DecimalType(19, 3)),
    StructField("market_key", IntegerType),
    StructField("market_name", StringType),
    StructField("submarket_key", IntegerType),
    StructField("submarket_name", StringType),
    StructField("latitude", DecimalType(19, 6)),
    StructField("longitude", DecimalType(19, 6))))

  /** product dim — Data Ingestion.sql:84-97. */
  val product: StructType = StructType(Seq(
    StructField("prod_key", IntegerType),
    StructField("prod_name", StringType),
    money("vol"), money("wgt"),
    StructField("brand_name", StringType),
    StructField("status_code", IntegerType),
    StructField("status_code_name", StringType),
    StructField("category_key", IntegerType),
    StructField("category_name", StringType),
    StructField("subcategory_key", IntegerType),
    StructField("subcategory_name", StringType)))

  /** DDL-exact variants (NUMERIC(38,2) money) for consumers that need
    * Snowflake type fidelity rather than reference-runtime parity. */
  private def withDdlMoney(s: StructType): StructType = StructType(s.map {
    case StructField(n, DoubleType, nl, m) => StructField(n, DecimalType(38, 2), nl, m)
    case f => f
  })
  val salesDdl: StructType = withDdlMoney(sales)
  val inventoryDdl: StructType = withDdlMoney(inventory)
  val productDdl: StructType = withDdlMoney(product)

  /** table name → schema, in the reference's canonical input order
    * (Data Transformation.py:24-30 assumes [calendar, inventory,
    * product, sales, store]). */
  val byName: Map[String, StructType] = Map(
    "calendar" -> calendar, "inventory" -> inventory,
    "product" -> product, "sales" -> sales, "store" -> store)

  val tableOrder: Seq[String] = Seq("calendar", "inventory", "product", "sales", "store")
}
