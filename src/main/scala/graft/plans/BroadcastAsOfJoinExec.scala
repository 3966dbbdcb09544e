package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, GenerateUnsafeProjection, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}

/** Broadcast as-of join: the build side ships through
  * [[AsOfSortedBroadcastMode]] — grouped by key and time-sorted ONCE on
  * the driver, HashedRelation-style — and every probe row answers its
  * "greatest build time ≤ probe time" with a floor binary search over
  * its key's sorted run ([[AsOfRunIndex.find]]) — the reference's
  * `greatest_not_exceeding` (/root/reference/src/algo/search.rs:51-80)
  * run verbatim-in-spirit against broadcast state, including
  * `None`-before-first ⇒ null payload (search.rs:66-68). (The search
  * is an independent iterative formulation: the reference's recursive
  * version underflows when the needle precedes the slice — SURVEY §2.1
  * P3 note — which an inclusive-bounds `lo <= hi` loop with an `ans`
  * cursor cannot do.)
  *
  * The probe side participates in WHOLE-STAGE CODEGEN: this node
  * implements `CodegenSupport` the way `BroadcastHashJoinExec` does —
  * the streamed child produces rows into this pipeline, the generated
  * consume projects the probe (key, time), calls the shared
  * [[AsOfRunIndex.find]] kernel, and splices the matched build row's
  * columns as output variables. No iterator hop, no JoinedRow, no
  * per-row result projection. The interpreted `doExecute` remains as
  * the codegen-off fallback.
  *
  * Scale contract: NEITHER side shuffles — the probe streams through
  * unmoved (its partitioning/ordering are preserved), and the build
  * moves once via broadcast. This is the right plan when the build is
  * a bounded dimension (rates, settings, slowly-changing attributes):
  * the merge-based [[AsOfJoinExec]] would pay a full hash exchange of
  * a 100-TB probe to co-locate it with kilobytes of build data. The
  * build must fit in executor memory — the usual broadcast contract.
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(
      AsOfSortedBroadcastMode((rightKeys :+ rightTime)
        .map(BindReferences.bindReference(_, right.output)))) :: Nil

  private def indexFactory: AsOfIndexFactory =
    AsOfIndexFactory(
      rightKeys.map(BindReferences.bindReference(_, right.output)),
      BindReferences.bindReference(rightTime, right.output),
      rightTime.dataType, id)

  // ---- interpreted path (codegen disabled) ----

  override protected def doExecute(): RDD[InternalRow] = {
    val broadcastRight = right.executeBroadcast[Array[InternalRow]]()
    val rightWidth = right.output.size
    val outputAttrs = output
    val (lKeyExprs, lTimeExpr, lOutput) = (leftKeys, leftTime, left.output)
    val factory = indexFactory

    left.execute().mapPartitions({ lIter =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOutput)
      val index = factory.get(broadcastRight)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      lIter.map { lRow =>
        val m = index.find(lKeyProj(lRow), lTimeProj(lRow))
        resultProj(joined(lRow, if (m == null) nullRight else m))
      }
    }, preservesPartitioning = true)
  }

  // ---- whole-stage codegen path ----

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[CodegenSupport].inputRDDs()

  // 1:1 streaming join — copy semantics follow the streamed side
  // (the two-child default throws)
  override def needCopyResult: Boolean =
    left.asInstanceOf[CodegenSupport].needCopyResult

  override protected def doProduce(ctx: CodegenContext): String =
    left.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
      row: ExprCode): String = {
    // broadcast + per-executor index, materialized once per task class
    val bcCls = classOf[org.apache.spark.broadcast.Broadcast[_]].getName
    val idxCls = classOf[AsOfRunIndex].getName
    val facCls = classOf[AsOfIndexFactory].getName
    val bcTerm = ctx.addReferenceObj("asofBroadcast",
      right.executeBroadcast[Array[InternalRow]](), bcCls)
    val facTerm = ctx.addReferenceObj("asofIndexFactory", indexFactory, facCls)
    val idxTerm = ctx.addMutableState(idxCls, "asofIndex",
      v => s"$v = ($idxCls) $facTerm.get(($bcCls) $bcTerm);",
      forceInline = true)

    // probe (key, time) as UnsafeRows over the streamed row's vars
    ctx.currentVars = input
    val keyEv = GenerateUnsafeProjection.createCode(ctx,
      leftKeys.map(BindReferences.bindReference(_, left.output)))
    val tsEv = GenerateUnsafeProjection.createCode(ctx,
      Seq(BindReferences.bindReference(leftTime, left.output)))

    val matched = ctx.freshName("asofMatched")
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofRIsNull")
      val value = ctx.freshName("asofRValue")
      val jt = CodeGenerator.javaType(a.dataType)
      val code =
        code"""
          |boolean $isNull = $matched == null || $matched.isNullAt($i);
          |$jt $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)}
          |  : (${CodeGenerator.getValue(matched, a.dataType, i.toString)});
         """.stripMargin
      ExprCode(code, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }

    s"""
       |${keyEv.code}
       |${tsEv.code}
       |InternalRow $matched = $idxTerm.find(${keyEv.value}, ${tsEv.value});
       |${consume(ctx, input ++ rightVars)}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsOfJoinExec {
  /** Executor-local memo of run indexes over presorted broadcasts,
    * keyed by (broadcast id, plan id): tasks share one index per
    * executor. Soft values let the JVM reclaim finished queries'. */
  private[plans] object buildCache {
    private val cache: com.google.common.cache.Cache[String, AnyRef] =
      com.google.common.cache.CacheBuilder.newBuilder()
        .softValues().maximumSize(64).build[String, AnyRef]()
    def get[T <: AnyRef](key: (Long, Int), loader: () => T): T =
      cache.get(s"${key._1}_${key._2}",
        new java.util.concurrent.Callable[AnyRef] {
          override def call(): AnyRef = loader()
        }).asInstanceOf[T]
  }
}
