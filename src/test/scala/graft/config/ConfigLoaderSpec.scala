package graft.config

import org.scalatest.funsuite.AnyFunSuite

class ConfigLoaderSpec extends AnyFunSuite {

  test("parses ;-delimited CSV with header") {
    val rows = ConfigLoader.parseCsv(
      "COLUMN_NAME;COLUMN_ID;IS_ID;NEW_DATA_TYPE;TABLE_NAME;TRANSFORMATION\n" +
        "Id;1;t;int;T1;fn_transform_Integer(Id)\n" +
        "Nombre;2;;string;T1;fn_transform_ClearString(Nombre)")
    assert(rows.size === 2)
    assert(rows.head("COLUMN_NAME") === "Id")
    assert(rows.head("TRANSFORMATION") === "fn_transform_Integer(Id)")
  }

  test("quote sanitization: triple quotes and wrapping quotes removed") {
    val rows = ConfigLoader.parseCsv(
      "A;B\n\"quoted value\";x\"\"\"y\"\"\"z")
    assert(rows.head("A") === "quoted value")
    assert(rows.head("B") === "x\"y\"z")
  }

  test("quoted delimiter does not split") {
    val rows = ConfigLoader.parseCsv("A;B\n\"a;b\";c")
    assert(rows.head("A") === "a;b")
    assert(rows.head("B") === "c")
  }

  test("quoted HEADER cells resolve: spreadsheet exports must not silently default") {
    val rows = ConfigLoader.parseCsv(
      "\"STAGE_TABLE_NAME\";\"SOURCE_TABLE\";\"STATUS\"\n" +
        "stage_x;SRC_X;A")
    assert(rows.head("STAGE_TABLE_NAME") === "stage_x")
    val tables = ConfigLoader.tablesFrom(rows)
    assert(tables.head.stageTableName === "stage_x")
    assert(tables.head.sourceTable === "SRC_X")
  }

  test("columnsFrom maps flags and ids") {
    val rows = ConfigLoader.parseCsv(
      "COLUMN_NAME;COLUMN_ID;IS_FILTER_DATE;IS_ID;IS_ORDER_BY;IS_PARTITION;NEW_DATA_TYPE;TABLE_NAME;TRANSFORMATION\n" +
        "Id;1;;T;;;int;T1;fn_transform_Integer(Id)")
    val cols = ConfigLoader.columnsFrom(rows)
    assert(cols.head === ColumnMetadata("Id", 1, "int", "fn_transform_Integer(Id)",
      isPartition = false, isId = true, isOrderBy = false, isFilterDate = false))
  }

  test("tablesFrom maps NUM_DAYS (an explicit days_off window survives)") {
    // without this mapping an explicit days_off table silently falls
    // back to the 10-day inference default — rows 10..N days old would
    // never extract
    val rows = ConfigLoader.parseCsv(
      "STAGE_TABLE_NAME;SOURCE_TABLE;SOURCE_TABLE_TYPE;LOAD_TYPE;NUM_DAYS\n" +
        "s1;T1;t;days_off;30\n" +
        "s2;T2;t;;")
    val tables = ConfigLoader.tablesFrom(rows)
    assert(tables.head.loadType === "days_off")
    assert(tables.head.numDays === "30")
    assert(tables(1).numDays === "")
  }

  test("blank LOAD_TYPE inference: 't' → incremental, else full") {
    assert(TableConfig(stageTableName = "s", sourceTable = "t",
      sourceTableType = "t").effectiveLoadType === "incremental")
    assert(TableConfig(stageTableName = "s", sourceTable = "t",
      sourceTableType = "m").effectiveLoadType === "full")
    assert(TableConfig(stageTableName = "s", sourceTable = "t",
      loadType = "between-date").effectiveLoadType === "between-date")
  }

  test("blank LOAD_TYPE inference: Salesforce 't' → days_off with NUM_DAYS=10") {
    val t = TableConfig(stageTableName = "s", sourceTable = "t",
      sourceTableType = "t")
    assert(t.effectiveLoadType("SALESFORCE_ING") === "days_off")
    val inferred = t.withInferredLoadType("SALESFORCE_ING")
    assert(inferred.loadType === "days_off" && inferred.numDays === "10")
    // any other endpoint keeps the plain transactional default
    assert(t.effectiveLoadType("SOME_DB") === "incremental")
    assert(t.withInferredLoadType("SOME_DB").numDays === "")
    // an explicit LOAD_TYPE passes through untouched, NUM_DAYS intact
    val explicit = t.copy(loadType = "days_off", numDays = "30")
    assert(explicit.withInferredLoadType("SALESFORCE_ING") === explicit)
    // non-transactional Salesforce tables still infer full
    assert(TableConfig(stageTableName = "s", sourceTable = "t",
      sourceTableType = "m").effectiveLoadType("SALESFORCE_ING") === "full")
  }

  test("multi-value PROCESS_ID splits") {
    assert(TableConfig(stageTableName = "s", sourceTable = "t",
      processId = "10, 20").processIds === Seq("10", "20"))
  }
}
