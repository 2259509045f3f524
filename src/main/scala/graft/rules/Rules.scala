package graft.rules

import graft.ir._
import graft.ir.PipelineOp._

/** Catalyst-style rule framework over the pipeline IR — mirrors the
  * reference's extension transaction (extensions.py:32-126): precondition →
  * apply → postcondition, with safety rails (DAG acyclicity, schema
  * invariance checked by the runner via Compiler.schemaInvariant).
  * These rewrites live OUTSIDE Catalyst on purpose (SURVEY §4.3): LP-driven
  * parallelism and cache placement aren't in Catalyst's vocabulary; the
  * relational optimizations Catalyst already does are not rebuilt here.
  */
trait Rule {
  def name: String
  def precondition(g: PipelineGraph): Either[String, Unit] = Right(())
  def rewrite(g: PipelineGraph): PipelineGraph
  def postcondition(before: PipelineGraph, after: PipelineGraph): Either[String, Unit] = {
    // universal rails: still a DAG, sink preserved
    scala.util.Try(after.topoOrder).toEither.left.map(e => s"$name: ${e.getMessage}")
      .map(_ => ())
  }
}

object Rules {

  /** Parallelism set/increase (graphdef_util.py:904-955). */
  final case class SetParallelism(nodeId: Int, theta: Int) extends Rule {
    val name = s"SetParallelism($nodeId, $theta)"
    override def precondition(g: PipelineGraph): Either[String, Unit] =
      if (!g.byId.contains(nodeId)) Left(s"$name: no node $nodeId")
      else if (!PipelineOp.supportsParallelism(g.byId(nodeId).op))
        Left(s"$name: op not parallelizable")
      else Right(())
    def rewrite(g: PipelineGraph): PipelineGraph =
      g.withNode(g.byId(nodeId).copy(parallelism = math.max(1, theta)))
  }

  /** Bulk LP θ application (graphdef_util.py:957-972); rounds up, min 1
    * (optimizer path, pipeline_optimizer.py:77-89).
    */
  final case class ApplyLpThetas(thetas: Map[Int, Double]) extends Rule {
    val name = "ApplyLpThetas"
    def rewrite(g: PipelineGraph): PipelineGraph =
      thetas.foldLeft(g) { case (acc, (id, t)) =>
        acc.byId.get(id) match {
          case Some(n) if PipelineOp.supportsParallelism(n.op) =>
            acc.withNode(n.copy(parallelism = math.max(1, math.ceil(t).toInt)))
          case _ => acc
        }
      }
  }

  /** Cache insertion after `afterNode` (pipeline_optimizer.py:1250-1350):
    * splice a CacheOp between the node and its consumers.
    */
  final case class InsertCache(afterNode: Int) extends Rule {
    val name = s"InsertCache($afterNode)"
    override def precondition(g: PipelineGraph): Either[String, Unit] =
      if (!g.byId.contains(afterNode)) Left(s"$name: no node")
      else if (g.randomTainted.contains(afterNode))
        Left(s"$name: node is downstream of a random UDF") // A9 safety
      else Right(())
    def rewrite(g: PipelineGraph): PipelineGraph = {
      val cacheId = g.nextId
      val rewired = g.nodes.map { n =>
        if (n.id != cacheId && n.inputs.contains(afterNode) && n.id != afterNode)
          n.copy(inputs = n.inputs.map(i => if (i == afterNode) cacheId else i))
        else n
      }
      val sink2 = if (g.sink == afterNode) cacheId else g.sink
      PipelineGraph(rewired :+ PipelineNode(cacheId, CacheOp, Seq(afterNode)), sink2)
    }
  }

  /** Cache removal (graphdef_util.py:797-833; extensions.py:99-126). */
  case object RemoveCaches extends Rule {
    val name = "RemoveCaches"
    def rewrite(g: PipelineGraph): PipelineGraph = {
      val caches = g.nodes.filter(_.op == CacheOp)
      caches.foldLeft(g) { (acc, c) =>
        val upstream = c.inputs.head
        val rewired = acc.nodes.filterNot(_.id == c.id).map { n =>
          n.copy(inputs = n.inputs.map(i => if (i == c.id) upstream else i))
        }
        PipelineGraph(rewired, if (acc.sink == c.id) upstream else acc.sink)
      }
    }
  }

  /** Prefetch insertion below the sink's first real node
    * (pipeline_optimizer.py:363-387): compiled as a no-op, kept for
    * roofline reporting parity.
    */
  final case class InsertPrefetch(buffer: Int) extends Rule {
    val name = s"InsertPrefetch($buffer)"
    def rewrite(g: PipelineGraph): PipelineGraph = {
      val pid = g.nextId
      val oldSink = g.sink
      PipelineGraph(g.nodes :+ PipelineNode(pid, Prefetch(buffer), Seq(oldSink)), pid)
    }
  }

  case object RemovePrefetch extends Rule {
    val name = "RemovePrefetch"
    def rewrite(g: PipelineGraph): PipelineGraph = {
      val pf = g.nodes.filter(n => n.op.isInstanceOf[Prefetch])
      pf.foldLeft(g) { (acc, p) =>
        val upstream = p.inputs.head
        val rewired = acc.nodes.filterNot(_.id == p.id).map { n =>
          n.copy(inputs = n.inputs.map(i => if (i == p.id) upstream else i))
        }
        PipelineGraph(rewired, if (acc.sink == p.id) upstream else acc.sink)
      }
    }
  }

  /** Source-only truncation for I/O ceiling measurement
    * (graphdef_util.py:835-880): keep only the (first) source subgraph.
    */
  case object SourceOnlyTruncate extends Rule {
    val name = "SourceOnlyTruncate"
    def rewrite(g: PipelineGraph): PipelineGraph = {
      val src = g.topoOrder.find(id => PipelineOp.isSource(g.byId(id).op)).get
      PipelineGraph(Seq(g.byId(src).copy(inputs = Nil)), src)
    }
  }

  /** Dead-node elimination (graphdef_util.py:494-508). */
  case object DeadNodeElim extends Rule {
    val name = "DeadNodeElim"
    def rewrite(g: PipelineGraph): PipelineGraph =
      PipelineGraph(g.nodes.filter(n => g.reachableFromSink.contains(n.id)), g.sink)
  }
}

/** Transactional runner (extensions.py:73-126): each rule's precondition
  * gates the rewrite; postcondition + acyclicity verify it; a failed step
  * rolls back to the prior graph and is reported, not thrown.
  */
object RuleRunner {
  final case class Report(applied: Seq[String], skipped: Seq[(String, String)],
      graph: PipelineGraph)

  def run(g0: PipelineGraph, rules: Seq[Rule]): Report = {
    var g = g0
    val applied = scala.collection.mutable.ArrayBuffer[String]()
    val skipped = scala.collection.mutable.ArrayBuffer[(String, String)]()
    rules.foreach { r =>
      r.precondition(g) match {
        case Left(reason) => skipped += r.name -> reason
        case Right(_) =>
          val g1 = scala.util.Try(r.rewrite(g))
          g1.toEither.left.map(_.getMessage).flatMap(g2 =>
            r.postcondition(g, g2).map(_ => g2)) match {
            case Left(reason) => skipped += r.name -> reason
            case Right(g2)    => g = g2; applied += r.name
          }
      }
    }
    Report(applied.toSeq, skipped.toSeq, g)
  }
}
