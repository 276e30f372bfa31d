package graft

import org.apache.spark.sql.types.StructType

/** A declarative validation suite — the engine's `RootSchema` analog.
  *
  * `definitions` play the role of the reference's `#/definitions/<name>`
  * registry: [[NamedRef]] nodes are substituted at compile time (pure,
  * driver-side), exactly like `$ref` resolution in
  * `/root/reference/verify/src/impls/schemars/schema.rs:124-150` — and a
  * missing name fails compilation with the `MissingDefinition` analog
  * (errors.rs:169-181), BEFORE any data is touched.
  *
  * `compile` is the analog of the reference's schema self-validation
  * (`RootSchema::verify`, verify.rs:9-171): regexes compile, bounds are
  * ordered, enum sets non-empty, and — beyond the reference — every column
  * reference is checked against the input schema with its expected type.
  */
final case class ConstraintSuite(
    keyCol: String,
    rowChecks: Seq[RowConstraint],
    aggChecks: Seq[AggConstraint] = Nil,
    definitions: Map[String, RowConstraint] = Map.empty,
    nBuckets: Int = 256) {

  /** Substitute NamedRef nodes from `definitions` (cycle-safe via depth cap). */
  private def resolve(c: RowConstraint, depth: Int): Either[SuiteError, RowConstraint] =
    if (depth > 32) Left(SuiteError.Unsupported("resolve", "definition recursion deeper than 32"))
    else c match {
      case NamedRef(name) =>
        definitions.get(name)
          .toRight(SuiteError.MissingDefinition(name))
          .flatMap(resolve(_, depth + 1))
      case All(n, cs) => sequence(cs.map(resolve(_, depth + 1))).map(All(n, _))
      case AnyOf(n, cs) => sequence(cs.map(resolve(_, depth + 1))).map(AnyOf(n, _))
      case OneOf(n, cs) => sequence(cs.map(resolve(_, depth + 1))).map(OneOf(n, _))
      case NotC(n, c0) => resolve(c0, depth + 1).map(NotC(n, _))
      case TagDispatch(n, tagCol, cases) =>
        cases.toSeq.sortBy(_._1).foldRight(
          Right(Map.empty[String, RowConstraint]): Either[SuiteError, Map[String, RowConstraint]]) {
          case ((k, v), acc) =>
            for (m <- acc; rv <- resolve(v, depth + 1)) yield m + (k -> rv)
        }.map(TagDispatch(n, tagCol, _))
      case IfThenElse(n, i, t, e) =>
        for {
          ri <- resolve(i, depth + 1)
          rt <- resolve(t, depth + 1)
          re <- e match {
            case Some(x) => resolve(x, depth + 1).map(Some(_))
            case None => Right(None)
          }
        } yield IfThenElse(n, ri, rt, re)
      case leaf => Right(leaf)
    }

  private def sequence[A](xs: Seq[Either[SuiteError, A]]): Either[SuiteError, Seq[A]] =
    xs.foldRight(Right(Nil): Either[SuiteError, List[A]]) { (e, acc) =>
      for (a <- e; rest <- acc) yield a :: rest
    }

  /** Compile-time self-check + ref resolution. Left = every problem found
    * (errors accumulate here too — consistent with the engine's
    * accumulate-all-errors contract). */
  def compile(schema: StructType): Either[List[SuiteError], CompiledSuite] = {
    val resolved = rowChecks.map(resolve(_, 0))
    val refErrors = resolved.collect { case Left(e) => e }.toList
    val goodRows = resolved.collect { case Right(c) => c }
    val keyErrors = Constraints.requireCol(schema, keyCol, s"keyCol($keyCol)")
    val rowErrors = goodRows.flatMap(_.selfCheck(schema)).toList
    val aggErrors = aggChecks.flatMap(_.selfCheck(schema)).toList
    val bucketErrors =
      if (nBuckets > 0) Nil else List(SuiteError.Unsupported("suite", s"nBuckets=$nBuckets"))
    // duplicate ids would collide in the fail_by_check map (Spark's map key
    // dedup policy is EXCEPTION) — reject at compile time
    val dupErrors = (goodRows.map(_.id) ++ aggChecks.map(_.id))
      .groupBy(identity).collect { case (id, xs) if xs.size > 1 =>
        SuiteError.Unsupported("suite", s"duplicate constraint id '$id'")
      }.toList
    val all = keyErrors ++ refErrors ++ rowErrors ++ aggErrors ++ bucketErrors ++ dupErrors
    if (all.nonEmpty) Left(all)
    else Right(CompiledSuite(keyCol, goodRows, aggChecks, nBuckets))
  }
}
