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
  // untranslatable leaf (falls to None): collated comparison semantics
  // don't map to a binary === — declining is the sound answer. (r15:
  // AlwaysTrue/AlwaysFalse, the previous fixture, now translate
  // EXACTLY — they're constant leaves, safe even under NOT — so the
  // fixture moved to a filter the translator genuinely declines.)
  private val u = CollatedEqualTo("a", "x",
    org.apache.spark.sql.types.StringType)

  test("AND weakens safely; OR requires both branches; leaves exact") {
    assert(GraftLakeSource.toColumn(u).isEmpty)
    // constant leaves translate exactly (truncateTable()'s shape —
    // DELETE FROM t with no WHERE arrives as AlwaysTrue)
    assert(GraftLakeSource.toColumn(AlwaysTrue()).isDefined)
    assert(GraftLakeSource.toColumn(Not(AlwaysFalse())).isDefined,
      "constant leaves are exact, so NOT may negate them")
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

  test("partition predicates: AND weakens; OR unions when BOTH " +
      "branches constrain the partition column, else reads all") {
    assert(GraftLakeSource.partPredicate(EqualTo("pc", "x"), "pc")
      .exists(p => p("x") && !p("y")))
    assert(GraftLakeSource.partPredicate(
      And(GreaterThan("pc", "b"), u), "pc")
      .exists(p => p("c") && !p("a")), "AND weakens to the pc conjunct")
    // the r13-verdict OR-union: month='a' OR month='b' prunes to two
    assert(GraftLakeSource.partPredicate(
      Or(EqualTo("pc", "x"), EqualTo("pc", "y")), "pc")
      .exists(p => p("x") && p("y") && !p("z")))
    // an OR branch that only constrains a DATA column admits every
    // partition — the whole OR must read all (sound, not pruned)
    assert(GraftLakeSource.partPredicate(
      Or(EqualTo("pc", "x"), EqualTo("data", 1)), "pc").isEmpty,
      "OR mixing partition and data columns stays read-all")
    // each OR branch may itself be AND-weakened (covariant position)
    assert(GraftLakeSource.partPredicate(
      Or(And(EqualTo("pc", "x"), u), EqualTo("pc", "y")), "pc")
      .exists(p => p("x") && p("y") && !p("z")))
  }

  test("partition NOT negates only an EXACT pc-only subtree") {
    assert(GraftLakeSource.partPredicate(
      Not(EqualTo("pc", "x")), "pc")
      .exists(p => !p("x") && p("y")), "exact leaf negates")
    assert(GraftLakeSource.partPredicate(
      Not(Or(EqualTo("pc", "x"), EqualTo("pc", "y"))), "pc")
      .exists(p => !p("x") && !p("y") && p("z")))
    // negating a WEAKENED subtree would prune partitions whose rows
    // the original filter accepts — must stay read-all
    assert(GraftLakeSource.partPredicate(
      Not(And(EqualTo("pc", "x"), u)), "pc").isEmpty,
      "not(weakened AND) never prunes")
    assert(GraftLakeSource.partPredicate(
      Not(And(EqualTo("pc", "x"), EqualTo("data", 1))), "pc").isEmpty,
      "not(pc AND data) never prunes — the data conjunct weakened away")
    assert(GraftLakeSource.partPredicate(
      Not(Not(And(EqualTo("pc", "x"), u))), "pc").isEmpty,
      "polarity discipline holds through nested NOTs")
  }
}
