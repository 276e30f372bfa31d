package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Runtime JSON Schema (draft-07 subset) → [[ConstraintSuite]] loader — the
  * analog of the reference's dynamic-schema entry point, where a
  * `RootSchema` is plain data loaded at runtime
  * (`/root/reference/verify/tests/schemars.rs:93`;
  * `SchemaValidator` dispatch `verify/src/impls/schemars/schema.rs:18-34`).
  *
  * The root schema must be an object whose `properties` map to the table's
  * columns; per-property keywords compile to the engine's constraints:
  *
  * | keyword | constraint |
  * | --- | --- |
  * | required               | NonNull (C21) |
  * | minimum/maximum/exclusive* | Range (C4-C7) |
  * | multipleOf             | MultipleOf (C3) |
  * | pattern                | Regex (C8) |
  * | minLength/maxLength    | LengthBounds (C9/C10) |
  * | enum                   | EnumIn (C2) |
  * | items.minimum/maximum  | ArrayElemRange (C11) |
  * | items.enum             | ArrayElemIn (C11) |
  * | contains.const         | ArrayContainsValue (C13) |
  * | minItems/maxItems      | ArraySizeBounds (C15/C16) |
  * | uniqueItems            | ArrayUniqueItems (C14) |
  * | allOf/anyOf/oneOf/not  | All/AnyOf/OneOf/NotC (K1-K3, K5) |
  * | if/then/else           | IfThenElse (K4) |
  * | $ref #/definitions/X   | inline expansion (K6; missing ⇒ MissingDefinition) |
  * | false / true schema    | Never / Always (C24) |
  *
  * Unknown keywords are IGNORED (JSON Schema semantics: annotations);
  * unsupported STRUCTURAL features (e.g. non-local $ref) are compile errors,
  * matching the reference's `ExternalReference` (errors.rs:169-181).
  */
object JsonSchema {

  private val mapper = new ObjectMapper()

  /** Parse a root object schema into a suite keyed by `keyCol`.
    * All problems are accumulated, reference-style. */
  def parse(json: String, keyCol: String, nBuckets: Int = 256)
      : Either[List[SuiteError], ConstraintSuite] = {
    val root =
      try mapper.readTree(json)
      catch {
        case e: Exception =>
          return Left(List(SuiteError.Unsupported("jsonschema", s"invalid JSON: ${e.getMessage}")))
      }
    val errors = scala.collection.mutable.ListBuffer.empty[SuiteError]
    val defs: Map[String, JsonNode] =
      Option(root.get("definitions")).map(d =>
        d.properties().asScala.map(e => e.getKey -> e.getValue).toMap).getOrElse(Map.empty)

    def resolve(node: JsonNode, depth: Int): JsonNode = {
      val ref = Option(node.get("$ref")).map(_.asText())
      ref match {
        case Some(r) if depth > 32 =>
          errors += SuiteError.Unsupported("$ref", "recursion deeper than 32"); node
        case Some(r) if r.startsWith("#/definitions/") =>
          defs.get(r.stripPrefix("#/definitions/")) match {
            case Some(d) => resolve(d, depth + 1)
            case None => errors += SuiteError.MissingDefinition(r); node
          }
        case Some(r) =>
          errors += SuiteError.Unsupported("$ref", s"external reference $r"); node
        case None => node
      }
    }

    /** Compile one property subschema against its column. */
    def compileProp(col: String, node0: JsonNode, depth: Int): List[RowConstraint] = {
      if (node0.isBoolean)
        return if (node0.asBoolean()) Nil else List(Never(s"never($col)"))
      val node = resolve(node0, depth)
      val out = scala.collection.mutable.ListBuffer.empty[RowConstraint]
      def num(k: String): Option[Double] = Option(node.get(k)).filter(_.isNumber).map(_.asDouble())
      def intOpt(k: String): Option[Int] = Option(node.get(k)).filter(_.isNumber).map(_.asInt())
      def txt(k: String): Option[String] = Option(node.get(k)).filter(_.isTextual).map(_.asText())

      // numeric bounds (draft-07: exclusiveMinimum/Maximum are numbers)
      val lo = num("minimum"); val xlo = num("exclusiveMinimum")
      val hi = num("maximum"); val xhi = num("exclusiveMaximum")
      if (lo.isDefined || hi.isDefined || xlo.isDefined || xhi.isDefined)
        out += Range(col,
          min = xlo.orElse(lo).getOrElse(Double.NegativeInfinity),
          max = xhi.orElse(hi).getOrElse(Double.PositiveInfinity),
          exclusiveMin = xlo.isDefined, exclusiveMax = xhi.isDefined)
      num("multipleOf").foreach(m => out += MultipleOf(col, m))
      txt("pattern").foreach(p => out += Regex(col, p))
      val minL = intOpt("minLength"); val maxL = intOpt("maxLength")
      if (minL.isDefined || maxL.isDefined) out += LengthBounds(col, minL, maxL)
      Option(node.get("enum")).filter(_.isArray).foreach { e =>
        val values = e.elements().asScala.map { v =>
          if (v.isTextual) v.asText()
          else if (v.isIntegralNumber) v.asLong()
          else if (v.isNumber) v.asDouble()
          else if (v.isBoolean) v.asBoolean()
          else v.toString
        }.toSeq
        out += EnumIn(col, values)
      }
      // arrays
      Option(node.get("items")).foreach { it =>
        val itR = if (it.isBoolean) it else resolve(it, depth)
        if (!itR.isBoolean) {
          val elo = Option(itR.get("minimum")).filter(_.isNumber).map(_.asDouble())
          val ehi = Option(itR.get("maximum")).filter(_.isNumber).map(_.asDouble())
          if (elo.isDefined || ehi.isDefined)
            out += ArrayElemRange(col, elo.getOrElse(Double.NegativeInfinity),
              ehi.getOrElse(Double.PositiveInfinity))
          Option(itR.get("enum")).filter(_.isArray).foreach { e =>
            val values = e.elements().asScala.map(v =>
              if (v.isTextual) v.asText()
              else if (v.isIntegralNumber) v.asLong()
              else v.asDouble()).toSeq
            out += ArrayElemIn(col, values)
          }
        }
      }
      Option(node.get("contains")).flatMap(c => Option(c.get("const"))).foreach { cst =>
        val v: Any =
          if (cst.isTextual) cst.asText()
          else if (cst.isIntegralNumber) cst.asLong()
          else cst.asDouble()
        out += ArrayContainsValue(col, v)
      }
      val minI = intOpt("minItems"); val maxI = intOpt("maxItems")
      if (minI.isDefined || maxI.isDefined) out += ArraySizeBounds(col, minI, maxI)
      if (Option(node.get("uniqueItems")).exists(_.asBoolean(false)))
        out += ArrayUniqueItems(col)
      // combinators (per property, same column)
      def subList(k: String): List[List[RowConstraint]] =
        Option(node.get(k)).filter(_.isArray).map(_.elements().asScala.toList
          .map(n => compileProp(col, n, depth + 1))).getOrElse(Nil)
      val allOf = subList("allOf")
      if (allOf.nonEmpty) out += All(col, allOf.flatten)
      val anyOf = subList("anyOf")
      if (anyOf.nonEmpty) out += AnyOf(col, anyOf.map(cs => All(col + ".alt", cs)))
      val oneOf = subList("oneOf")
      if (oneOf.nonEmpty) out += OneOf(col, oneOf.map(cs => All(col + ".alt", cs)))
      Option(node.get("not")).foreach { n =>
        out += NotC(col, All(col + ".inner", compileProp(col, n, depth + 1)))
      }
      for (i <- Option(node.get("if")); t <- Option(node.get("then"))) {
        val e = Option(node.get("else"))
        out += IfThenElse(col,
          All(col + ".if", compileProp(col, i, depth + 1)),
          All(col + ".then", compileProp(col, t, depth + 1)),
          e.map(x => All(col + ".else", compileProp(col, x, depth + 1))))
      }
      out.toList
    }

    val rootR = resolve(root, 0)
    val props = Option(rootR.get("properties"))
      .map(p => p.properties().asScala.map(e => e.getKey -> e.getValue).toList)
      .getOrElse {
        errors += SuiteError.Unsupported("jsonschema", "root schema has no 'properties'")
        Nil
      }
    val required: Set[String] = Option(rootR.get("required")).filter(_.isArray)
      .map(_.elements().asScala.map(_.asText()).toSet).getOrElse(Set.empty)

    val checks: List[RowConstraint] =
      required.toList.sorted.map(NonNull(_)) ++
        props.flatMap { case (col, sub) => compileProp(col, sub, 0) }

    if (errors.nonEmpty) Left(errors.toList)
    else Right(ConstraintSuite(keyCol, checks, nBuckets = nBuckets))
  }
}
