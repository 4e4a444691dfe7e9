package graft

import graft.operators.Joins
import graft.sources.Tables

class SkewJoinSpec extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
  private lazy val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")

  test("saltedJoin is row-for-row equivalent to the plain inner join") {
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
    val salted = Joins.saltedJoin(li, o, "l_orderkey", "o_orderkey", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty, "salted produced extra rows")
    assert(plain.exceptAll(salted).isEmpty, "salted dropped rows")
  }

  test("saltedJoin keys the join on (key, salt) so a hot key spreads across reducers") {
    val p = Joins.saltedJoin(li, o, "l_orderkey", "o_orderkey", salts = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("__lsalt"), p)
  }
}
