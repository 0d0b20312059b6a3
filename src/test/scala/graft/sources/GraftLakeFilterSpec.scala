package graft.sources

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** The pushdown-translation soundness rule: every translated predicate
  * must be IMPLIED BY the original filter (superset of its rows) —
  * weakening is legal under AND/OR (covariant), ILLEGAL under NOT
  * (a negated weakened conjunction rejects rows the original accepts,
  * and the inner scan loses them before the residual re-check). These
  * unit-test the translator directly; the end-to-end surface rides
  * GraftLakeSourceSpec. */
class GraftLakeFilterSpec extends AnyFunSuite {

  private val t = EqualTo("a", 1) // translatable leaf
  private val u = AlwaysTrue() // untranslatable leaf (falls to None)

  test("AND weakens safely; OR requires both branches; leaves exact") {
    assert(GraftLakeSource.toColumn(u).isEmpty)
    assert(GraftLakeSource.toColumn(And(t, u)).isDefined,
      "AND may drop an untranslatable conjunct (superset)")
    assert(GraftLakeSource.toColumn(Or(t, u)).isEmpty,
      "OR must translate whole — a dropped branch loses rows")
    assert(GraftLakeSource.toColumn(Or(t, EqualTo("b", 2))).isDefined)
  }

  test("NOT translates only an EXACT subtree — never a weakened one") {
    assert(GraftLakeSource.toColumn(Not(t)).isDefined)
    assert(GraftLakeSource.toColumn(Not(And(t, u))).isEmpty,
      "not(weakened AND) would reject rows the original accepts")
    assert(GraftLakeSource.toColumn(Not(And(t, EqualTo("b", 2))))
      .isDefined, "a fully-translatable subtree negates fine")
    assert(GraftLakeSource.toColumn(Not(Or(t, u))).isEmpty)
    assert(GraftLakeSource.toColumn(Not(Not(And(t, u)))).isEmpty,
      "polarity discipline holds through nested NOTs")
  }

  test("partition predicates stay positive-only and AND-weakened") {
    assert(GraftLakeSource.partPredicate(EqualTo("pc", "x"), "pc")
      .exists(p => p("x") && !p("y")))
    assert(GraftLakeSource.partPredicate(
      And(GreaterThan("pc", "b"), u), "pc")
      .exists(p => p("c") && !p("a")), "AND weakens to the pc conjunct")
    assert(GraftLakeSource.partPredicate(
      Not(EqualTo("pc", "x")), "pc").isEmpty,
      "negations never prune (conservative read-all)")
    assert(GraftLakeSource.partPredicate(
      Or(EqualTo("pc", "x"), EqualTo("pc", "y")), "pc").isEmpty,
      "disjunctions never prune (conservative read-all)")
  }
}
