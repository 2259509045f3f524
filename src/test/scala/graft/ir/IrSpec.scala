package graft.ir

import graft.compile.GraphCodec
import graft.ir.PipelineOp._
import org.scalatest.funsuite.AnyFunSuite

class IrSpec extends AnyFunSuite {

  private def chain: PipelineGraph = PipelineGraph(
    Seq(
      PipelineNode(0, Scan("lineitem")),
      PipelineNode(1, MapE(Seq("l_orderkey"))),
      PipelineNode(2, MapE(Seq("l_orderkey"), random = true), Seq(1)),
      PipelineNode(3, FilterE("l_orderkey > 0"), Seq(2)),
      PipelineNode(4, Take(10, Seq("l_orderkey")), Seq(3)))
      .zipWithIndex.map { case (n, i) => if (i == 0) n else n.copy(inputs = Seq(i - 1)) },
    sink = 4)

  test("topological order respects edges and is deterministic") {
    assert(chain.topoOrder == Seq(0, 1, 2, 3, 4))
    val diamond = PipelineGraph(
      Seq(
        PipelineNode(0, Scan("orders")),
        PipelineNode(1, MapE(Seq("o_orderkey")), Seq(0)),
        PipelineNode(2, FilterE("o_orderkey > 0"), Seq(0)),
        PipelineNode(3, ConcatOp, Seq(1, 2))),
      sink = 3)
    val t = diamond.topoOrder
    assert(t.indexOf(0) < t.indexOf(1) && t.indexOf(0) < t.indexOf(2))
    assert(t.indexOf(3) == 3)
  }

  test("canonical Base_k renaming counts per base in topo order") {
    val names = chain.canonicalNames
    assert(names(1) == "MapE_0" && names(2) == "MapE_1")
    assert(names(0) == "Scan_0" && names(4) == "Take_0")
  }

  test("random taint propagates to all downstream consumers only") {
    assert(chain.randomTainted == Set(2, 3, 4))
  }

  test("WL hash is invariant under node-id relabeling") {
    val relabeled = PipelineGraph(
      chain.nodes.map(n =>
        n.copy(id = n.id + 100, inputs = n.inputs.map(_ + 100))),
      sink = 104)
    assert(chain.wlHash == relabeled.wlHash)
    // and changes when the structure changes
    val mutated = chain.withNode(chain.byId(3).copy(op = MapE(Seq("l_orderkey"))))
    assert(chain.wlHash != mutated.wlHash)
  }

  test("diff reports added/removed nodes (compat check A17)") {
    val (onlyA, onlyB) = chain.diff(chain)
    assert(onlyA.isEmpty && onlyB.isEmpty)
    val bigger = PipelineGraph(chain.nodes :+ PipelineNode(9, CacheOp, Seq(4)), 9)
    val (a2, b2) = bigger.diff(chain)
    assert(a2 == Set("9:CacheOp") && b2.isEmpty)
  }

  test("cycle detection rejects cyclic graphs") {
    val cyclic = PipelineGraph(
      Seq(
        PipelineNode(0, Scan("orders"), Seq(1)),
        PipelineNode(1, MapE(Seq("x")), Seq(0))),
      sink = 1)
    assertThrows[IllegalArgumentException](cyclic.topoOrder)
  }

  test("codec round-trips every op kind") {
    val g = PipelineGraph(
      Seq(
        PipelineNode(0, Scan("lineitem", Seq("l_orderkey", "l_quantity")), Nil, 4),
        PipelineNode(1, RangeSource(100)),
        PipelineNode(2, MapE(Seq("a", "b as c"), random = true), Seq(0)),
        PipelineNode(3, FilterE("a > 1"), Seq(2)),
        PipelineNode(4, Batch(16, true, "a % 4", Seq("a", "b"), Seq("sum(a) as sa")), Seq(3)),
        PipelineNode(5, ShuffleOp(7), Seq(4)),
        PipelineNode(6, Repeat(3), Seq(5)),
        PipelineNode(7, Take(5, Seq("a")), Seq(6)),
        PipelineNode(8, Skip(2, Seq("a")), Seq(7)),
        PipelineNode(9, ShardOp(4, 1, "a"), Seq(8)),
        PipelineNode(10, CacheOp, Seq(9)),
        PipelineNode(11, Prefetch(32), Seq(10)),
        PipelineNode(12, ZipOp(Seq("a"), Seq("b")), Seq(11, 1)),
        PipelineNode(13, ConcatOp, Seq(12, 1)),
        PipelineNode(14, FlatMapEcho("a % 2"), Seq(13)),
        PipelineNode(15, Unbatch("arr"), Seq(14)),
        PipelineNode(16, GroupByWindow("a % 3", 4, Seq("a"), Seq("max(a) as ma")), Seq(15))),
      sink = 16)
    val back = GraphCodec.fromRows(GraphCodec.toRows(g))
    assert(back.nodes.sortBy(_.id) == g.nodes.sortBy(_.id))
    assert(back.sink == g.sink)
  }

  test("codec round-trips expressions containing delimiters ('|', ',', ';;')") {
    // '||' (SQL string concat), ',' and ';;' must survive encode/decode
    // verbatim — a delimiter-joined arg encoding would shift fields.
    val g = PipelineGraph(
      Seq(
        PipelineNode(0, Scan("documents", Seq("doc_id", "text")), Nil),
        PipelineNode(1, FilterE("text || ',' IS NOT NULL"), Seq(0)),
        PipelineNode(2, MapE(Seq("concat(text, '|', ';;') as tagged", "doc_id"), false), Seq(1)),
        PipelineNode(3, Batch(4, false, "doc_id % 2", Seq("doc_id"),
          Seq("max(tagged || '|x') as mt")), Seq(2))),
      sink = 3)
    val back = GraphCodec.fromRows(GraphCodec.toRows(g))
    assert(back.nodes.sortBy(_.id) == g.nodes.sortBy(_.id))
  }

  test("DOT export names every node and edge") {
    val dot = chain.toDot()
    assert(dot.contains("MapE_1") && dot.contains("n0 -> n1"))
  }
}
