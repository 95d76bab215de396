package graft.schema

import org.scalatest.funsuite.AnyFunSuite

import graft._

/** Ports of the reference's schema tests
  * (`/root/reference/tests/test_schema.py:198-505`), including the
  * exact pinned compare-query string at `tests/test_schema.py:490`
  * which locks the join-path planner's tie-breaking behavior.
  */
class PlannerSpec extends AnyFunSuite {

  // Vehicle fixture (tests/test_schema.py:200-290, FIXTURES.md F1)
  def vehicleTables: Seq[Table] = Seq(
    Table("eigenaar", Seq("naam"), "id"),
    Table("merk", Seq("naam"), "id"),
    Table("voertuig_type", Seq("naam"), "id"),
    Table("dealer", Seq("naam"), "id"),
    Table("voertuig", Nil, "id", Seq("type_id", "merk_id")),
    Table("merk_dealer", Nil, "id", Seq("dealer_id", "merk_id")),
    Table("voertuig_eigenaar", Nil, "", Seq("eigenaar_id", "voertuig_id")),
    Table("aankoop", Seq("datum"), "", Seq("voertuig_id", "merk_dealer_id")),
  )

  def vehicleRefs: Seq[Reference] = Seq(
    Reference("voertuig", "type_id", "voertuig_type", "id"),
    Reference("voertuig", "merk_id", "merk", "id"),
    Reference("merk_dealer", "merk_id", "merk", "id"),
    Reference("merk_dealer", "dealer_id", "dealer", "id"),
    Reference("voertuig_eigenaar", "eigenaar_id", "eigenaar", "id"),
    Reference("voertuig_eigenaar", "voertuig_id", "voertuig", "id"),
    Reference("aankoop", "voertuig_id", "voertuig", "id"),
    Reference("aankoop", "merk_dealer_id", "merk_dealer", "id"),
  )

  def vehicleSchema: Schema = new Schema(vehicleTables, vehicleRefs)

  test("Table model basics (test_schema.py:84-168)") {
    val t = Table("voertuig", Seq("kleur"), "id", Seq("merk_id"))
    assert(t.hasPrimaryKey)
    assert(!t.isLinking)
    assert(t.columnsAndForeignKeys == Seq("merk_id", "kleur"))
    assert(t.prefixColumnMap == Seq(
      "voertuig.merk_id" -> "merk_id", "voertuig.kleur" -> "kleur"))
    assert(t.contains("kleur") && t.contains("voertuig.kleur"))
    assert(!t.contains("id") && !t.contains("nope"))
    assert(t.getCommonColumns(Seq("kleur", "x")) == Seq("kleur"))

    val linking = Table("ab", Nil, "", Seq("a_id", "b_id"))
    assert(linking.isLinking && !linking.hasPrimaryKey)

    intercept[InvalidTableError](Table("leeg", Nil, "id"))
  }

  test("Reference model + self-reference rejection (test_schema.py:174-195)") {
    val r = Reference("voertuig", "merk_id", "merk", "id")
    assert(r.joinSql == "ON voertuig.merk_id = merk.id")
    intercept[InvalidReferenceError](Reference("a", "x", "a", "y"))
    intercept[InvalidReferenceError](Reference("", "x", "b", "y"))
  }

  test("graph construction: bad FK target rejected (test_bugs.py:145-162)") {
    intercept[TableDoesNotExistError] {
      new Schema(
        Seq(Table("a", Seq("x"), "id"), Table("b", Seq("y"), "", Seq("a_id"))),
        Seq(Reference("b", "a_id", "aa", "id")))
    }
  }

  test("graph construction: cycles rejected (schema.py:269-271)") {
    intercept[AssertionError] {
      new Schema(
        Seq(Table("a", Seq("x"), "id", Seq("b_id")),
          Table("b", Seq("y"), "id", Seq("a_id"))),
        Seq(Reference("a", "b_id", "b", "id"),
          Reference("b", "a_id", "a", "id")))
    }
  }

  test("topological sort matches networkx order") {
    assert(vehicleSchema.graph.topologicalSort == Seq(
      "eigenaar", "merk", "voertuig_type", "dealer",
      "voertuig", "merk_dealer", "voertuig_eigenaar", "aankoop"))
  }

  test("column→table resolution + errors (test_schema.py:300-340)") {
    val s = vehicleSchema
    assert(s.getTableNameByColumn("datum") == "aankoop")
    assert(s.getTableNameByColumn("merk.naam") == "merk")
    intercept[NoSuchColumnInSchemaError](s.getTableNameByColumn("bestaat_niet"))
    intercept[ColumnIsAmbiguousError](s.getTableNameByColumn("naam"))
    intercept[NoSuchColumnForTableError](s.getTableNameByColumn("merk.datum"))
    intercept[TableDoesNotExistError](s.getTableNameByColumn("fiets.naam"))
  }

  test("relevant tables incl. linking-table chain (schema.py:356-397)") {
    val s = vehicleSchema
    assert(s.getRelevantTables(Seq(
      "voertuig_type.naam", "eigenaar.naam", "merk.naam", "dealer.naam", "datum",
    )) == Seq(
      // sorted-unique initial tables, then linking tables in topo order
      "aankoop", "dealer", "eigenaar", "merk", "voertuig_type",
      "voertuig", "merk_dealer", "voertuig_eigenaar"))
  }

  test("load instructions (test_schema.py:444-480)") {
    val li = vehicleSchema.getLoadInstructions(Seq(
      "eigenaar.naam", "voertuig_type.naam", "merk.naam", "dealer.naam", "datum"))
    assert(li.insertAndRetrieve == Seq(
      InsertAndRetrieveSpec("eigenaar", "eigenaar_id", Seq("eigenaar.naam" -> "naam")),
      InsertAndRetrieveSpec("merk", "merk_id", Seq("merk.naam" -> "naam")),
      InsertAndRetrieveSpec("voertuig_type", "type_id", Seq("voertuig_type.naam" -> "naam")),
      InsertAndRetrieveSpec("dealer", "dealer_id", Seq("dealer.naam" -> "naam")),
      InsertAndRetrieveSpec("voertuig", "voertuig_id", Nil),
      InsertAndRetrieveSpec("merk_dealer", "merk_dealer_id", Nil),
    ))
    assert(li.insert == Seq(
      InsertSpec("voertuig_eigenaar", Nil),
      InsertSpec("aankoop", Nil)))
  }

  test("compare query matches reference byte-for-byte (test_schema.py:490)") {
    val expected =
      "SELECT\naankoop.datum as \"datum\",\ndealer.naam as \"dealer.naam\",\neigenaar.naam as \"eigenaar.naam\",\nmerk.naam as \"merk.naam\",\nvoertuig_type.naam as \"voertuig_type.naam\"\nFROM voertuig_type\nLEFT JOIN voertuig ON voertuig.type_id = voertuig_type.id\nLEFT JOIN merk ON voertuig.merk_id = merk.id\nLEFT JOIN merk_dealer ON merk_dealer.merk_id = merk.id\nLEFT JOIN dealer ON merk_dealer.dealer_id = dealer.id\nLEFT JOIN aankoop ON aankoop.voertuig_id = voertuig.id\nLEFT JOIN voertuig_eigenaar ON voertuig_eigenaar.voertuig_id = voertuig.id\nLEFT JOIN eigenaar ON voertuig_eigenaar.eigenaar_id = eigenaar.id"
    val got = vehicleSchema.getCompareQuery(Seq(
      "voertuig_type.naam", "eigenaar.naam", "merk.naam", "dealer.naam", "datum"))
    assert(got == expected)
  }

  test("compare query: where clause appended (schema.py:463-464)") {
    val q = vehicleSchema.getCompareQuery(
      Seq("merk.naam"), where = Some("WHERE merk.naam = 'BMW'"))
    assert(q.endsWith("\nWHERE merk.naam = 'BMW'"))
  }

  test("single-table compare query (schema.py:505-508)") {
    val s = new Schema(Seq(Table("a", Seq("x", "y"), "id")), Nil)
    // reference concatenates with no separator before FROM on the
    // single-table path — reproduced faithfully
    assert(s.getCompareQuery(Seq("x", "y")) ==
      "SELECT\na.x as \"x\",\na.y as \"y\"FROM a")
  }

  test("isolated tables / subgraphs rejected (schema.py:471-487)") {
    val s = new Schema(
      Seq(Table("a", Seq("x"), "id"), Table("b", Seq("y"), "id")), Nil)
    intercept[IsolatedTablesError](s.getCompareQuery(Seq("x", "y")))

    val s2 = new Schema(
      Seq(
        Table("a", Seq("x"), "id"), Table("b", Seq("y"), "", Seq("a_id")),
        Table("c", Seq("z"), "id"), Table("d", Seq("w"), "", Seq("c_id"))),
      Seq(Reference("b", "a_id", "a", "id"), Reference("d", "c_id", "c", "id")))
    intercept[IsolatedSubgraphsError](s2.getCompareQuery(Seq("x", "y", "z", "w")))
  }

  test("parse_insert / parse_retrieve errors (schema.py:653-714)") {
    val s = vehicleSchema
    // common columns intersect on bare names: prefixed inputs are
    // renamed by preprocess before parse_insert in the reference flow
    assert(s.parseInsert("merk", Seq("naam", "datum")) == Seq("naam"))
    intercept[EmptyColumnListError](s.parseInsert("merk", Nil))
    intercept[ColumnsDoNotExistOnTableError](s.parseInsert("merk", Seq("datum")))

    assert(s.parseRetrieve("merk", "merk_id", Seq("naam")) ==
      (("id", Seq("naam"))))
    intercept[NoPrimaryKeyError](s.parseRetrieve("aankoop", "x", Seq("datum")))
    intercept[AliasDoesNotExistError](
      s.parseRetrieve("merk", "fout_id", Seq("merk.naam")))
  }

  test("false ambiguity: unrelated multi-FK table (test_bugs.py:165-189)") {
    // c has two FKs to a; loading only {a,b} must not raise
    val s = new Schema(
      Seq(
        Table("a", Seq("a"), "id"),
        Table("b", Seq("b"), "", Seq("a_id")),
        Table("c", Seq("c"), "", Seq("a1_id", "a2_id"))),
      Seq(
        Reference("b", "a_id", "a", "id"),
        Reference("c", "a1_id", "a", "id"),
        Reference("c", "a2_id", "a", "id")))
    val li = s.getLoadInstructions(Seq("a", "b"))
    assert(li.insertAndRetrieveTables == Seq("a"))
    assert(li.insertTables == Seq("b"))
  }

  test("spurious linking tables not scheduled (test_bugs.py:15-113)") {
    // parentless unrelated tables must not be dragged in via the
    // linking-table walk (all-of-empty-predecessors pitfall): a
    // linking table with NO predecessors outside the selection is
    // still only added when all its predecessors are selected —
    // a zero-predecessor linking table would vacuously match, so
    // guard with a schema where that shape exists
    val s = new Schema(
      Seq(
        Table("stof", Seq("naam"), "id"),
        Table("kleur", Seq("kleur"), "", Seq("stof_id")),
        Table("los", Nil, "", Seq("x_id", "y_id")),
        Table("x", Seq("x"), "id"),
        Table("y", Seq("y"), "id")),
      Seq(
        Reference("kleur", "stof_id", "stof", "id"),
        Reference("los", "x_id", "x", "id"),
        Reference("los", "y_id", "y", "id")))
    val li = s.getLoadInstructions(Seq("naam", "kleur"))
    assert(li.insertAndRetrieveTables == Seq("stof"))
    assert(li.insertTables == Seq("kleur"))
  }

  test("empty schema guard (test_schema.py:495-505)") {
    val s = new Schema(Nil, Nil)
    assert(s.isEmpty)
    intercept[EmptySchemaError](s.checkSchemaNotEmpty())
  }
}
