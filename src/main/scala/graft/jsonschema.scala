package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType, StructType}
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
  * | type / ["t1","t2"]     | JsonTypeIs (C1, static) / IsNull for "null" (C23) |
  * | required               | NonNull (C21) |
  * | minimum/maximum/exclusive* | Range (C4-C7; BOTH bounds apply — strictest per side); DecimalRange when the table schema proves the column exact AND a bound would round in f64 |
  * | multipleOf             | MultipleOf (C3) |
  * | pattern                | Regex (C8) |
  * | minLength/maxLength    | LengthBounds (C9/C10) |
  * | enum / const           | EnumIn (C2; fractional floats ⇒ f64::EPSILON mode, macros.rs:189) |
  * | items (object form)    | ArrayElemRange / ArrayElemIn / ArrayElemPattern / ArrayElemLength / JsonTypeIs(element) (C11) |
  * | items (tuple form)     | ArrayElemAtRange per position (C12, schema.rs:718-726) |
  * | additionalItems        | ArrayTailRange; `false` ⇒ maxItems=prefix (schema.rs:727-735) |
  * | items[i]: false        | maxItems = i (merged into one ArraySizeBounds) |
  * | contains.const         | ArrayContainsValue (C13) |
  * | contains (schema form) | ArrayContainsSchema over ElemPreds: range/enum/pattern/length; type ⇒ element type + minItems 1 (C13 general, schema.rs:698-706) |
  * | minItems/maxItems      | ArraySizeBounds (C15/C16) |
  * | uniqueItems            | ArrayUniqueItems (C14) |
  * | properties (nested)    | struct column ⇒ dotted-path recursion; map column ⇒ MapValueRange (C17) |
  * | patternProperties      | MapValueRange(keyPattern) (C18) |
  * | additionalProperties:false | struct/root ⇒ StructKeysIn (static); map ⇒ MapKeysIn (C19) |
  * | propertyNames          | pattern ⇒ MapKeyPattern; min/maxLength ⇒ MapKeyLength; enum ⇒ MapKeysIn; type:"string" static (C20 general, schema.rs:874-883) |
  * | required (nested)      | struct ⇒ NonNull(dotted); map ⇒ MapRequiredKeys (C21) |
  * | min/maxProperties      | MapSizeBounds (C22) |
  * | dependencies           | IfThenElse(present(K) ⇒ required/schema) at root, struct, and map levels (draft-07; reference omits it) |
  * | allOf/anyOf/oneOf/not  | All/AnyOf/OneOf/NotC (K1-K3, K5) |
  * | if/then/else           | IfThenElse (K4) |
  * | $ref #/definitions/X   | inline expansion (K6; missing ⇒ MissingDefinition) |
  * | false / true schema    | property position ⇒ IsNull / no-op (null stance); combinator position ⇒ Never / Always (C24) |
  *
  * Whether nested object keywords target a STRUCT column (static fields,
  * dotted-path constraints) or a MAP column (dynamic keys, Map* constraints)
  * is decided from `tableSchema` when given; without it the loader assumes
  * dynamic maps (the runtime-schema use case).
  *
  * ANNOTATION keywords (title, description, format, …) are ignored per JSON
  * Schema semantics. Anything STRUCTURAL the engine cannot express is a
  * compile ERROR, never a silent no-op — matching the reference's
  * `ExternalReference`-style failure (errors.rs:169-181): an ignored
  * constraint would silently under-validate.
  */
object JsonSchema {

  private val mapper = new ObjectMapper()

  /** `f64::EPSILON` — the reference's float-enum compare tolerance (macros.rs:189). */
  val F64Epsilon: Double = 2.220446049250313e-16

  private val annotationKeys = Set(
    "title", "description", "default", "examples", "$comment", "format",
    "readOnly", "writeOnly", "deprecated", "$schema", "$id",
    "contentMediaType", "contentEncoding")

  /** Parse a root object schema into a suite keyed by `keyCol`.
    * All problems are accumulated, reference-style. `tableSchema` (optional)
    * routes nested object keywords to struct vs map constraints. */
  /** `validateFormats = true` upgrades draft-07 `format` from annotation to
    * assertion (the spec's opt-in stance): KNOWN formats ([[Formats.known]])
    * on string schemas compile to [[FormatCheck]]; unknown format names stay
    * ignored annotations per draft-07. The reference never implements format
    * (`// TODO format`, macros.rs:327) — parity-PLUS. */
  def parse(json: String, keyCol: String, nBuckets: Int = 256,
      tableSchema: Option[StructType] = None,
      validateFormats: Boolean = false)
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

    def keysOf(n: JsonNode): List[String] =
      n.properties().asScala.toList.map(_.getKey)

    /** Error on structural keywords outside `handled` (annotations pass). */
    def flagUnsupported(n: JsonNode, handled: Set[String], ctx: String): Unit =
      keysOf(n).filterNot(handled).filterNot(annotationKeys).foreach { k =>
        errors += SuiteError.Unsupported(ctx, s"unsupported keyword '$k'")
      }

    def num(n: JsonNode, k: String): Option[Double] =
      Option(n.get(k)).filter(_.isNumber).map(_.asDouble())
    def intOpt(n: JsonNode, k: String): Option[Int] =
      Option(n.get(k)).filter(_.isNumber).map(_.asInt())
    def txt(n: JsonNode, k: String): Option[String] =
      Option(n.get(k)).filter(_.isTextual).map(_.asText())

    /** Regex keyword read with EAGER syntax validation: the reference's
      * `RootSchema::verify` reports an invalid pattern ALONGSIDE $ref errors
      * in one pass (tests/schemars.rs:109-141); deferring to the constraint
      * selfCheck would silently drop it whenever other parse errors already
      * abort before compile. The constraint is still emitted (selfCheck
      * double-reports at compile, harmlessly). */
    def patTxt(n: JsonNode, k: String): Option[String] =
      txt(n, k).map { p =>
        scala.util.Try(java.util.regex.Pattern.compile(p)) match {
          case scala.util.Failure(e) =>
            errors += SuiteError.InvalidPattern(p, e.getMessage)
          case _ => ()
        }
        p
      }

    /** The ONE draft-07 bound-merge rule (minimum AND exclusiveMinimum apply
      * independently — keep the single strictest effective bound per side,
      * exclusive wins ties), parameterized over the comparison domain so
      * the f64 and exact-decimal forms cannot drift. */
    def mergeSides[T](lo: Option[T], xlo: Option[T], hi: Option[T], xhi: Option[T])(
        cmp: (T, T) => Int): (Option[T], Boolean, Option[T], Boolean) = {
      val (minV, minX) = (lo, xlo) match {
        case (Some(a), Some(b)) => if (cmp(b, a) >= 0) (Some(b), true) else (Some(a), false)
        case (Some(a), None) => (Some(a), false)
        case (None, Some(b)) => (Some(b), true)
        case (None, None) => (None, false)
      }
      val (maxV, maxX) = (hi, xhi) match {
        case (Some(a), Some(b)) => if (cmp(b, a) <= 0) (Some(b), true) else (Some(a), false)
        case (Some(a), None) => (Some(a), false)
        case (None, Some(b)) => (Some(b), true)
        case (None, None) => (None, false)
      }
      (minV, minX, maxV, maxX)
    }

    def mergedBounds(n: JsonNode): (Option[Double], Boolean, Option[Double], Boolean) =
      mergeSides(num(n, "minimum"), num(n, "exclusiveMinimum"),
        num(n, "maximum"), num(n, "exclusiveMaximum"))(java.lang.Double.compare)

    /** [[mergedBounds]] in the EXACT decimal domain (Jackson's decimalValue
      * preserves every digit of a JSON number) — used to detect and route
      * bounds that an f64 would silently round. */
    def exactMergedBounds(n: JsonNode): (Option[java.math.BigDecimal], Boolean,
        Option[java.math.BigDecimal], Boolean) = {
      def dec(k: String): Option[java.math.BigDecimal] =
        Option(n.get(k)).filter(_.isNumber).map(_.decimalValue())
      mergeSides(dec("minimum"), dec("exclusiveMinimum"),
        dec("maximum"), dec("exclusiveMaximum"))(_.compareTo(_))
    }

    /** Inclusive-normalized bounds for element-domain constraints (which are
      * inclusive-only): exclusive b ⇒ nextUp/nextDown(b) — exact in the
      * double domain (`x > b ⇔ x ≥ nextUp(b)` for every double x). */
    def inclusiveBounds(n: JsonNode): (Option[Double], Option[Double]) = {
      val (minV, minX, maxV, maxX) = mergedBounds(n)
      (minV.map(v => if (minX) Math.nextUp(v) else v),
        maxV.map(v => if (maxX) Math.nextDown(v) else v))
    }

    /** (non-null values, use-epsilon-compare, had a JSON null entry).
      * JSON `null` entries are tracked separately — mapping NullNode via
      * toString would admit the literal STRING "null" on a string column. */
    def enumValues(e: JsonNode): (Seq[Any], Boolean, Boolean) = {
      val all = e.elements().asScala.toSeq
      val hadNull = all.exists(_.isNull)
      val values = all.filterNot(_.isNull).map { v =>
        if (v.isTextual) v.asText()
        else if (v.isIntegralNumber) v.asLong()
        else if (v.isNumber) v.asDouble()
        else if (v.isBoolean) v.asBoolean()
        else v.toString
      }
      val fractional = values.exists {
        case d: Double => d != Math.floor(d) || d.isInfinite
        case _ => false
      }
      val allNumeric = values.forall(_.isInstanceOf[Number])
      (values, fractional && allNumeric, hadNull)
    }

    def jsonTypes(n: JsonNode): List[String] =
      Option(n.get("type")).toList.flatMap { t =>
        if (t.isTextual) List(t.asText())
        else if (t.isArray) t.elements().asScala.map(_.asText()).toList
        else Nil
      }

    def colKind(colPath: String): String =
      tableSchema.flatMap(s => Constraints.fieldType(s, colPath)) match {
        case Some(_: StructType) => "struct"
        case _ => "map" // dynamic-map default; Map* selfChecks surface mismatches
      }

    /** Compile one property subschema against its (possibly dotted) column.
      *
      * `topLevel` marks a PROPERTY position (root or struct field): there a
      * `false` schema means "this property must not be present", which under
      * the engine's null stance is IsNull (null/absent passes, any value
      * fails). Inside combinators the same `false` must stay the
      * unsatisfiable Never — e.g. `not: false` is always-valid and
      * `oneOf:[false, S]` must not double-count null rows. */
    def compileProp(col: String, node0: JsonNode, depth: Int,
        topLevel: Boolean = false): List[RowConstraint] = {
      if (node0.isBoolean)
        return if (node0.asBoolean()) Nil
        else if (topLevel) List(IsNull(col))
        else List(Never(s"never($col)"))
      val node = resolve(node0, depth)
      val out = scala.collection.mutable.ListBuffer.empty[RowConstraint]

      // ---- type (C1): static conformance; lone "null" = per-row IsNull (C23)
      val types = jsonTypes(node)
      if (types == List("null")) out += IsNull(col)
      else if (types.nonEmpty) out += JsonTypeIs(col, types)

      // ---- numeric bounds. Default is the reference-faithful f64 Range
      // (the reference compares everything as f64). When the table schema
      // proves the column exact (integral/decimal) AND a bound loses
      // precision in the double domain (e.g. 2^60 + 1), route to
      // DecimalRange instead — a runtime schema's big-integer bound then
      // checks EXACTLY rather than silently rounding. Float columns and
      // schema-less parses keep the f64 form (their comparisons are
      // inherently double-domain; parity with the reference).
      val (minV, minX, maxV, maxX) = mergedBounds(node)
      if (minV.isDefined || maxV.isDefined) {
        def doubleExact(b: java.math.BigDecimal): Boolean =
          try new java.math.BigDecimal(b.doubleValue()).compareTo(b) == 0
          catch { case _: NumberFormatException => false } // infinite double
        val twoP53 = new java.math.BigDecimal(9007199254740992L)
        val (eMin, eMinX, eMax, eMaxX) = exactMergedBounds(node)
        // bounds contradictory in the EXACT domain are a LOUD compile error
        // — an f64-collapsed pair (min 2^60+1 > max 2^60 both round to
        // 2^60) would otherwise pass Range's own double-domain selfCheck
        // and admit rows no number can satisfy
        val inverted = (for (a <- eMin; b <- eMax) yield a.compareTo(b) > 0).getOrElse(false)
        if (inverted)
          errors += SuiteError.Unsupported(s"range($col)",
            s"inverted bounds: minimum ${eMin.get} > maximum ${eMax.get}")
        // the f64 form rounds on two sides, by COLUMN TYPE:
        //  - LongType values past 2^53 round across even a representable
        //    bound (2^60 + 1 collapses onto maximum = 2^60) — route when a
        //    bound is non-representable or its magnitude reaches 2^53;
        //  - DecimalType values are not binary fractions at all (0.1 has no
        //    double), so the exact form is simply correct — route whenever
        //    its contract fits;
        //  - Byte/Short/Int values (and any bound that matters to them) are
        //    always double-exact: the f64 verdicts are provably right, keep
        //    the cheaper form. Float/double columns and schema-less parses
        //    stay f64 (parity with the reference's all-f64 comparisons).
        val wantExact = tableSchema.flatMap(s => Constraints.fieldType(s, col)).exists {
          case _: DecimalType => true
          case LongType => (eMin.toList ++ eMax.toList).exists(b =>
            !doubleExact(b) || b.abs.compareTo(twoP53) >= 0)
          case _ => false
        }
        val candidate = DecimalRange(col,
          min = eMin.map(BigDecimal(_)), max = eMax.map(BigDecimal(_)),
          exclusiveMin = eMinX, exclusiveMax = eMaxX)
        // pre-flight the exact form's own contract (scale/precision fit);
        // configurations it cannot check exactly keep the f64 form (parity)
        if (!inverted) {
          if (wantExact && tableSchema.exists(s => candidate.selfCheck(s).isEmpty))
            out += candidate
          else
            out += Range(col,
              min = minV.getOrElse(Double.NegativeInfinity),
              max = maxV.getOrElse(Double.PositiveInfinity),
              exclusiveMin = minX, exclusiveMax = maxX)
        }
      }
      num(node, "multipleOf").foreach(m => out += MultipleOf(col, m))
      patTxt(node, "pattern").foreach(p => out += Regex(col, p))
      // format: assertion only when opted in AND the name is known —
      // unknown names remain annotations (draft-07 "SHOULD ignore")
      if (validateFormats)
        txt(node, "format").filter(Formats.known).foreach(f => out += FormatCheck(col, f))
      val minL = intOpt(node, "minLength"); val maxL = intOpt(node, "maxLength")
      if (minL.isDefined || maxL.isDefined) out += LengthBounds(col, minL, maxL)

      // ---- const / enum (fractional float enums ⇒ EPSILON compare).
      // Both present (legal draft-07): they apply independently, so compile
      // the INTERSECTION — two EnumIn's would collide on the id. Null
      // entries: EnumIn already passes null rows, so a null-INCLUDING enum
      // is EnumIn over the non-null values; a null-ONLY enum/const — and a
      // disjoint enum/const pair — compile to IsNull (null passes every
      // value constraint in this engine, so "no value is acceptable" means
      // "only null passes", never a row-killing Never). A literally empty
      // enum is INVALID draft-07 — loud compile error, not a silent Never.
      def emitEnum(vs: Seq[Any], eps: Boolean, nullAcceptable: Boolean): Unit =
        if (vs.nonEmpty) out += EnumIn(col, vs, epsilon = if (eps) F64Epsilon else 0.0)
        else if (nullAcceptable) out += IsNull(col)
        else errors += SuiteError.Unsupported(s"$col.enum", "empty enum (invalid draft-07)")
      val enumVs = Option(node.get("enum")).filter(_.isArray).map(enumValues)
      val constVs = Option(node.get("const"))
        .map(c => enumValues(mapper.createArrayNode().add(c.deepCopy[JsonNode]())))
      (enumVs, constVs) match {
        case (Some((evs, eEps, eNull)), Some((cvs, cEps, cNull))) =>
          val inter = evs.filter(cvs.contains)
          val bothNull = eNull && cNull
          if (inter.isEmpty && !bothNull) out += IsNull(col) // disjoint: only null passes
          else emitEnum(inter, eEps || cEps, bothNull)
        case (Some((evs, eps, hadNull)), None) => emitEnum(evs, eps, hadNull)
        case (None, Some((cvs, eps, hadNull))) => emitEnum(cvs, eps, hadNull)
        case _ => ()
      }

      // ---- arrays
      // size caps accumulated from items:false / positional-false /
      // additionalItems:false merge into ONE ArraySizeBounds with
      // minItems/maxItems below (several same-id constraints would collide)
      var capMax: Option[Int] = None
      def cap(m: Int): Unit = capMax = Some(capMax.fold(m)(math.min(m, _)))
      var floorMin: Option[Int] = None // contains:true / type-only contains ⇒ ≥1 element
      def floor(m: Int): Unit = floorMin = Some(floorMin.fold(m)(math.max(m, _)))
      Option(node.get("items")).foreach { it =>
        if (it.isArray) {
          // tuple form (C12): per-position bounds; one Catalyst element type
          // per array, so positional TYPE checks collapse to the element type
          val subs = it.elements().asScala.toList
          subs.zipWithIndex.foreach { case (s0, i) =>
            val s = if (s0.isBoolean) s0 else resolve(s0, depth)
            if (s.isBoolean) {
              // a FALSE positional schema means "index i must not exist" —
              // expressible as maxItems = i (reference: not_bool_schema!,
              // macros.rs:6-24)
              if (!s.asBoolean()) cap(i)
            } else {
              val (lo, hi) = inclusiveBounds(s)
              if (lo.isDefined || hi.isDefined)
                out += ArrayElemAtRange(col, i + 1,
                  lo.getOrElse(Double.NegativeInfinity), hi.getOrElse(Double.PositiveInfinity))
              // a positional type check collapses to the (single) element
              // type; identical checks dedupe via `distinct` below
              val pts = jsonTypes(s)
              if (pts.nonEmpty) out += JsonTypeIs(col, pts, element = true)
              flagUnsupported(s, Set("minimum", "maximum", "exclusiveMinimum",
                "exclusiveMaximum", "type"), s"$col.items[$i]")
            }
          }
          Option(node.get("additionalItems")).foreach { ai =>
            if (ai.isBoolean) {
              if (!ai.asBoolean()) cap(subs.length)
            } else {
              val aiR = resolve(ai, depth)
              val (lo, hi) = inclusiveBounds(aiR)
              if (lo.isDefined || hi.isDefined)
                out += ArrayTailRange(col, subs.length + 1,
                  lo.getOrElse(Double.NegativeInfinity), hi.getOrElse(Double.PositiveInfinity))
              val ats = jsonTypes(aiR)
              if (ats.nonEmpty) out += JsonTypeIs(col, ats, element = true)
              flagUnsupported(aiR, Set("minimum", "maximum", "exclusiveMinimum",
                "exclusiveMaximum", "type"), s"$col.additionalItems")
            }
          }
        } else if (it.isBoolean) {
          if (!it.asBoolean()) cap(0) // items:false ⇒ only []
        } else {
          val itR = resolve(it, depth)
          val itTypes = jsonTypes(itR)
          if (itTypes.nonEmpty) out += JsonTypeIs(col, itTypes, element = true)
          val (lo, hi) = inclusiveBounds(itR)
          if (lo.isDefined || hi.isDefined)
            out += ArrayElemRange(col,
              lo.getOrElse(Double.NegativeInfinity), hi.getOrElse(Double.PositiveInfinity))
          Option(itR.get("enum")).filter(_.isArray).foreach { e =>
            out += ArrayElemIn(col, enumValues(e)._1) // null elems fail isin → violations, as intended
          }
          patTxt(itR, "pattern").foreach(p => out += ArrayElemPattern(col, p))
          val eMinL = intOpt(itR, "minLength"); val eMaxL = intOpt(itR, "maxLength")
          if (eMinL.isDefined || eMaxL.isDefined) out += ArrayElemLength(col, eMinL, eMaxL)
          flagUnsupported(itR, Set("type", "minimum", "maximum", "exclusiveMinimum",
            "exclusiveMaximum", "enum", "pattern", "minLength", "maxLength"), s"$col.items")
        }
      }
      if (node.has("additionalItems") && !Option(node.get("items")).exists(_.isArray)) {
        // draft-07: additionalItems is meaningful only with tuple-form items;
        // elsewhere it is an annotation — ignore, don't error
      }
      Option(node.get("contains")).foreach { c0 =>
        val c = if (c0.isBoolean) c0 else resolve(c0, depth)
        if (c.isBoolean) {
          // contains:true ⇒ any element witnesses ⇒ minItems 1;
          // contains:false ⇒ no element can witness ⇒ no ARRAY passes —
          // null stays passing (value constraints never fail null here)
          if (c.asBoolean()) floor(1)
          else out += IsNull(col)
        } else {
          // general contains-SCHEMA (C13 completion, schema.rs:698-706):
          // ≥1 element must satisfy ALL the subschema's keywords. A lone
          // const stays the dedicated ArrayContainsValue; const WITH
          // siblings joins the predicate set (they apply conjointly).
          val preds = scala.collection.mutable.ListBuffer.empty[ElemPred]
          val constV: Option[Any] = Option(c.get("const")).flatMap { cst =>
            if (cst.isTextual) Some(cst.asText())
            else if (cst.isIntegralNumber) Some(cst.asLong())
            else if (cst.isNumber) Some(cst.asDouble())
            else if (cst.isBoolean) Some(cst.asBoolean())
            else { // null / array / object consts have no element-equality form here
              errors += SuiteError.Unsupported(s"$col.contains",
                s"contains.const of unsupported JSON kind '${cst.getNodeType}'")
              None
            }
          }
          val (lo, hi) = inclusiveBounds(c)
          if (lo.isDefined || hi.isDefined)
            preds += ElemRange(lo.getOrElse(Double.NegativeInfinity),
              hi.getOrElse(Double.PositiveInfinity))
          Option(c.get("enum")).filter(_.isArray).foreach(e => preds += ElemEnum(enumValues(e)._1))
          patTxt(c, "pattern").foreach(p => preds += ElemPatternPred(p))
          val cMinL = intOpt(c, "minLength"); val cMaxL = intOpt(c, "maxLength")
          if (cMinL.isDefined || cMaxL.isDefined) preds += ElemLengthPred(cMinL, cMaxL)
          // contains.type: Catalyst element types are uniform, so a
          // conforming type makes EVERY element a candidate — the static
          // element-type check plus "≥1 element exists" expresses it
          val cTypes = jsonTypes(c)
          if (cTypes.nonEmpty) out += JsonTypeIs(col, cTypes, element = true)
          (constV, preds.isEmpty) match {
            case (Some(v), true) => out += ArrayContainsValue(col, v)
            case (Some(v), false) => out += ArrayContainsSchema(col, ElemEnum(Seq(v)) +: preds.toList)
            case (None, false) => out += ArrayContainsSchema(col, preds.toList)
            case (None, true) =>
              if (cTypes.nonEmpty) floor(1)
              else errors += SuiteError.Unsupported(s"$col.contains",
                "contains schema has no expressible keywords")
          }
          flagUnsupported(c, Set("const", "minimum", "maximum", "exclusiveMinimum",
            "exclusiveMaximum", "enum", "pattern", "minLength", "maxLength",
            "type"), s"$col.contains")
        }
      }
      val minI = intOpt(node, "minItems"); val maxI = intOpt(node, "maxItems")
      val mergedMax = (maxI, capMax) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (a, b) => a.orElse(b)
      }
      val mergedMin = (minI, floorMin) match {
        case (Some(a), Some(b)) => Some(math.max(a, b))
        case (a, b) => a.orElse(b)
      }
      if (mergedMin.isDefined || mergedMax.isDefined)
        out += ArraySizeBounds(col, mergedMin, mergedMax)
      if (Option(node.get("uniqueItems")).exists(_.asBoolean(false)))
        out += ArrayUniqueItems(col)

      // ---- nested object keywords: struct column ⇒ static/dotted, else map
      val objProps: List[(String, JsonNode)] =
        Option(node.get("properties"))
          .map(p => p.properties().asScala.toList.map(e => e.getKey -> e.getValue))
          .getOrElse(Nil)
      val nestedRequired: List[String] =
        Option(node.get("required")).filter(_.isArray)
          .map(_.elements().asScala.map(_.asText()).toList).getOrElse(Nil)
      val hasObjKeywords = objProps.nonEmpty || nestedRequired.nonEmpty ||
        node.has("patternProperties") || node.has("additionalProperties") ||
        node.has("propertyNames") || node.has("minProperties") || node.has("maxProperties")
      if (hasObjKeywords) colKind(col) match {
        case "struct" =>
          // static fields: recurse with dotted paths (fieldType walks structs)
          objProps.foreach { case (k, sub) =>
            out ++= compileProp(s"$col.$k", sub, depth + 1, topLevel = true)
          }
          nestedRequired.foreach(k => out += NonNull(s"$col.$k"))
          Option(node.get("additionalProperties")).foreach { ap =>
            if (ap.isBoolean && !ap.asBoolean())
              out += StructKeysIn(col, objProps.map(_._1))
            else if (!ap.isBoolean)
              errors += SuiteError.Unsupported(s"$col.additionalProperties",
                "schema-form additionalProperties on a struct column")
          }
          List("patternProperties", "propertyNames", "minProperties", "maxProperties")
            .filter(node.has).foreach(k =>
              errors += SuiteError.Unsupported(s"$col.$k",
                "dynamic-key keyword on a STRUCT column (fields are static)"))
        case _ => // dynamic map
          objProps.foreach { case (k, sub) =>
            val subR = if (sub.isBoolean) sub else resolve(sub, depth)
            if (!subR.isBoolean) {
              val (lo, hi) = inclusiveBounds(subR)
              if (lo.isDefined || hi.isDefined)
                out += MapValueRange(col, "^" + java.util.regex.Pattern.quote(k) + "$",
                  lo.getOrElse(Double.NegativeInfinity), hi.getOrElse(Double.PositiveInfinity))
              // map values share ONE Catalyst type, so per-key `type`
              // collapses to a static map-VALUE type check (deduped below)
              val mts = jsonTypes(subR)
              if (mts.nonEmpty) out += JsonTypeIs(col, mts, mapValue = true)
              flagUnsupported(subR, Set("minimum", "maximum", "exclusiveMinimum",
                "exclusiveMaximum", "type"), s"$col.properties.$k")
            } else if (!subR.asBoolean())
              errors += SuiteError.Unsupported(s"$col.properties.$k", "false property schema")
          }
          if (nestedRequired.nonEmpty) out += MapRequiredKeys(col, nestedRequired)
          Option(node.get("additionalProperties")).foreach { ap =>
            if (ap.isBoolean) {
              if (!ap.asBoolean()) {
                if (objProps.nonEmpty) out += MapKeysIn(col, objProps.map(_._1))
                else errors += SuiteError.Unsupported(s"$col.additionalProperties",
                  "additionalProperties:false with no properties declared")
              }
            } else errors += SuiteError.Unsupported(s"$col.additionalProperties",
              "schema-form additionalProperties (applies to unmatched keys only)")
          }
          Option(node.get("patternProperties")).foreach { pp =>
            pp.properties().asScala.foreach { e =>
              val sub = if (e.getValue.isBoolean) e.getValue else resolve(e.getValue, depth)
              if (!sub.isBoolean) {
                val (lo, hi) = inclusiveBounds(sub)
                if (lo.isDefined || hi.isDefined)
                  out += MapValueRange(col, e.getKey,
                    lo.getOrElse(Double.NegativeInfinity), hi.getOrElse(Double.PositiveInfinity))
                val pts = jsonTypes(sub)
                if (pts.nonEmpty) out += JsonTypeIs(col, pts, mapValue = true)
                flagUnsupported(sub, Set("minimum", "maximum", "exclusiveMinimum",
                  "exclusiveMaximum", "type"), s"$col.patternProperties.${e.getKey}")
              }
            }
          }
          // propertyNames general schema (C20 completion, schema.rs:874-883):
          // keys are strings, so pattern / length / enum / type:"string" are
          // the expressible name keywords
          Option(node.get("propertyNames")).foreach { pn0 =>
            val pn = if (pn0.isBoolean) pn0 else resolve(pn0, depth)
            if (pn.isBoolean) {
              if (!pn.asBoolean()) out += MapSizeBounds(col, None, Some(0)) // no key is valid
            } else {
              var any = false
              patTxt(pn, "pattern").foreach { p => any = true; out += MapKeyPattern(col, p) }
              val kMinL = intOpt(pn, "minLength"); val kMaxL = intOpt(pn, "maxLength")
              if (kMinL.isDefined || kMaxL.isDefined) {
                any = true; out += MapKeyLength(col, kMinL, kMaxL)
              }
              Option(pn.get("enum")).filter(_.isArray).foreach { e =>
                any = true
                // NOTE shares MapKeysIn's id with additionalProperties:false;
                // declaring both on one column fails compile honestly
                out += MapKeysIn(col, enumValues(e)._1.map(_.toString))
              }
              val pnTypes = jsonTypes(pn)
              if (pnTypes.nonEmpty) {
                any = true
                if (pnTypes != List("string"))
                  errors += SuiteError.Unsupported(s"$col.propertyNames",
                    s"property names are strings; type must be 'string', got ${pnTypes.mkString("|")}")
                // type:"string" is statically true for map keys — no check
              }
              if (!any) errors += SuiteError.Unsupported(s"$col.propertyNames",
                "propertyNames schema has no expressible keywords")
              flagUnsupported(pn, Set("pattern", "minLength", "maxLength", "enum", "type"),
                s"$col.propertyNames")
            }
          }
          val minP = intOpt(node, "minProperties"); val maxP = intOpt(node, "maxProperties")
          if (minP.isDefined || maxP.isDefined) out += MapSizeBounds(col, minP, maxP)
      }

      // ---- dependencies (draft-07; the reference omits it — parity-plus):
      // "if key K is present, then …" compiles to IfThenElse. Property-
      // dependency form (array) ⇒ the listed keys are required; schema-
      // dependency form (object) ⇒ the subschema applies to this column.
      // Presence = map_contains_key on maps, field non-null on structs.
      Option(node.get("dependencies")).foreach { dep =>
        dep.properties().asScala.toList.sortBy(_.getKey).foreach { e =>
          val k = e.getKey
          val v = e.getValue
          val isStruct = colKind(col) == "struct"
          val ifC: RowConstraint =
            if (isStruct) NonNull(s"$col.$k") else MapRequiredKeys(col, Seq(k))
          val thenC: Option[RowConstraint] =
            if (v.isArray) {
              val deps = v.elements().asScala.map(_.asText()).toList
              if (deps.isEmpty) None
              else if (isStruct) Some(All(s"$col.dep.$k", deps.map(d => NonNull(s"$col.$d"))))
              else Some(MapRequiredKeys(col, deps))
            } else if (v.isObject || v.isBoolean) {
              val cs = compileProp(col, v, depth + 1)
              if (cs.isEmpty) None else Some(All(s"$col.dep.$k", cs))
            } else {
              errors += SuiteError.Unsupported(s"$col.dependencies.$k",
                "dependency must be an array of keys or a schema")
              None
            }
          thenC.foreach(t => out += IfThenElse(s"$col.dep.$k", ifC, t, None))
        }
      }

      // ---- combinators (per property, same column)
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
      // structural keywords nobody above handled are ERRORS, not silent no-ops
      flagUnsupported(node, Set("type", "minimum", "maximum", "exclusiveMinimum",
        "exclusiveMaximum", "multipleOf", "pattern", "minLength", "maxLength",
        "enum", "const", "items", "additionalItems", "contains", "minItems",
        "maxItems", "uniqueItems", "properties", "patternProperties",
        "additionalProperties", "propertyNames", "minProperties", "maxProperties",
        "required", "dependencies", "allOf", "anyOf", "oneOf", "not", "if", "then",
        "else", "$ref", "definitions"), col)
      // identical constraints from different keywords (e.g. two tuple
      // positions both declaring {"type":"integer"}) collapse to one
      out.toList.distinct
    }

    val rootR = resolve(root, 0)
    // Root-level structural keywords the loader does not compile (allOf /
    // anyOf / if-then-else / patternProperties / enum / …) must be ERRORS —
    // a silently-ignored root combinator under-validates. `type` is handled
    // below (must be "object"); properties / required / additionalProperties
    // / dependencies / definitions are compiled.
    flagUnsupported(rootR,
      Set("type", "properties", "required", "additionalProperties", "definitions",
        "dependencies", "x-graft-checks", "x-graft-agg"),
      "<root>")
    val rootTypes = jsonTypes(rootR)
    if (rootTypes.nonEmpty && rootTypes != List("object"))
      errors += SuiteError.Unsupported("<root>",
        s"root type must be 'object', got ${rootTypes.mkString("|")}")
    val props = Option(rootR.get("properties"))
      .map(p => p.properties().asScala.toList.map(e => e.getKey -> e.getValue))
      .getOrElse {
        errors += SuiteError.Unsupported("jsonschema", "root schema has no 'properties'")
        Nil
      }
    val required: Set[String] = Option(rootR.get("required")).filter(_.isArray)
      .map(_.elements().asScala.map(_.asText()).toSet).getOrElse(Set.empty)

    // root additionalProperties:false — UnknownProperty decided statically
    // against the table schema (C19 at root; reference raises it per value)
    val rootKeys: List[RowConstraint] =
      Option(rootR.get("additionalProperties")) match {
        case Some(ap) if ap.isBoolean && !ap.asBoolean() =>
          List(StructKeysIn("", props.map(_._1)))
        case Some(ap) if !ap.isBoolean =>
          errors += SuiteError.Unsupported("additionalProperties",
            "schema-form additionalProperties at root"); Nil
        case _ => Nil
      }

    // root dependencies (draft-07): "column K non-null ⇒ …". Array form ⇒
    // the listed columns must be non-null; schema form ⇒ a root-shaped
    // subschema (properties + required) applies.
    val rootDeps: List[RowConstraint] =
      Option(rootR.get("dependencies")).toList.flatMap { dep =>
        dep.properties().asScala.toList.sortBy(_.getKey).flatMap { e =>
          val k = e.getKey
          val v = e.getValue
          val thenC: Option[RowConstraint] =
            if (v.isArray) {
              val deps = v.elements().asScala.map(_.asText()).toList
              if (deps.isEmpty) None else Some(All(s"dep.$k", deps.map(NonNull(_))))
            } else if (v.isBoolean) {
              // draft-07 boolean dependency: false = "k must not be present"
              if (v.asBoolean()) None else Some(Never(s"never(dep.$k)"))
            } else if (v.isObject) {
              val vr = resolve(v, 1)
              flagUnsupported(vr, Set("properties", "required"), s"<root>.dependencies.$k")
              val subProps = Option(vr.get("properties"))
                .map(p => p.properties().asScala.toList.map(x => x.getKey -> x.getValue))
                .getOrElse(Nil)
              val subReq = Option(vr.get("required")).filter(_.isArray)
                .map(_.elements().asScala.map(_.asText()).toList).getOrElse(Nil)
              val cs = subReq.map(NonNull(_)) ++
                subProps.flatMap { case (c, s) => compileProp(c, s, 1) }
              if (cs.isEmpty) None else Some(All(s"dep.$k", cs))
            } else {
              errors += SuiteError.Unsupported(s"<root>.dependencies.$k",
                "dependency must be an array of columns or a schema")
              None
            }
          thenC.map(t => IfThenElse(s"dep.$k", NonNull(k), t, None))
        }
      }

    // ---- x-graft extensions: the engine-native checks draft-07 cannot
    // express, carried under a vendor namespace so a rendered suite
    // ([[JsonSchema.render]]) round-trips losslessly. Unknown kinds are LOUD
    // errors — a silently-dropped check under-validates.
    def xLong(o: JsonNode, k: String, ctx: String): Option[Long] =
      Option(o.get(k)).filter(_.isNumber).map(_.asLong()).orElse {
        errors += SuiteError.Unsupported(ctx, s"missing/non-numeric '$k'"); None
      }
    def xDouble(o: JsonNode, k: String, ctx: String): Option[Double] =
      Option(o.get(k)).filter(_.isNumber).map(_.asDouble()).orElse {
        errors += SuiteError.Unsupported(ctx, s"missing/non-numeric '$k'"); None
      }
    def xTxt(o: JsonNode, k: String, ctx: String): Option[String] =
      txt(o, k).orElse {
        errors += SuiteError.Unsupported(ctx, s"missing/non-string '$k'"); None
      }
    def xBool(o: JsonNode, k: String, default: Boolean): Boolean =
      Option(o.get(k)).filter(_.isBoolean).map(_.asBoolean()).getOrElse(default)
    def xElements(key: String): List[JsonNode] =
      Option(rootR.get(key)).toList.flatMap { a =>
        if (!a.isArray) {
          errors += SuiteError.Unsupported(key, "must be an array"); Nil
        } else a.elements().asScala.toList
      }

    val xRowChecks: List[RowConstraint] = xElements("x-graft-checks").flatMap { o =>
      val ctx = "x-graft-checks"
      txt(o, "kind") match {
        case Some("typeIs") =>
          for {
            c <- xTxt(o, "col", ctx)
            dtJson <- xTxt(o, "dataType", ctx)
            dt <- (try Some(org.apache.spark.sql.types.DataType.fromJson(dtJson))
            catch {
              case e: Exception =>
                errors += SuiteError.Unsupported(ctx, s"bad dataType: ${e.getMessage}"); None
            })
          } yield TypeIs(c, dt)
        case Some("colOrder") =>
          for (a <- xTxt(o, "a", ctx); b <- xTxt(o, "b", ctx))
            yield ColOrder(a, b, xBool(o, "allowEqual", default = true))
        case Some("lengthConsistent") =>
          for (a <- xTxt(o, "arrCol", ctx); l <- xTxt(o, "lenCol", ctx))
            yield LengthConsistent(a, l)
        case Some("padSuffixOnly") =>
          for (c <- xTxt(o, "col", ctx); p <- xLong(o, "pad", ctx))
            yield PadSuffixOnly(c, p)
        case Some("endsWithToken") =>
          for (c <- xTxt(o, "col", ctx); e <- xLong(o, "eos", ctx); p <- xLong(o, "pad", ctx))
            yield EndsWithToken(c, e, p)
        case Some("padAwareLength") =>
          for (a <- xTxt(o, "arrCol", ctx); l <- xTxt(o, "lenCol", ctx); p <- xLong(o, "pad", ctx))
            yield PadAwareLength(a, l, p)
        case Some("segmentLengthBounds") =>
          for {
            c <- xTxt(o, "col", ctx); s <- xLong(o, "sep", ctx)
            lo <- xLong(o, "minLen", ctx); hi <- xLong(o, "maxLen", ctx)
          } yield SegmentLengthBounds(c, s, lo, hi)
        case Some("tagDispatch") =>
          for {
            nm <- xTxt(o, "name", ctx)
            tc <- xTxt(o, "tagCol", ctx)
            casesO <- Option(o.get("cases")).filter(_.isObject).orElse {
              errors += SuiteError.Unsupported(ctx, "tagDispatch: missing 'cases' object"); None
            }
          } yield {
            val cases = casesO.properties().asScala.toList.flatMap { e =>
              val tag = e.getKey
              val cl = Option(e.getValue.get("col")).filter(_.isTextual).map(_.asText())
              val sn = Option(e.getValue.get("schema")).filter(_.isObject)
              (cl, sn) match {
                case (Some(c0), Some(s0)) => compileProp(c0, s0, 1) match {
                  case one :: Nil => Some(tag -> one)
                  case Nil =>
                    errors += SuiteError.Unsupported(ctx,
                      s"tagDispatch case '$tag' compiled to no constraints"); None
                  case many => Some(tag -> (All(c0, many): RowConstraint))
                }
                case _ =>
                  errors += SuiteError.Unsupported(ctx,
                    s"tagDispatch case '$tag' needs 'col' and 'schema'"); None
              }
            }
            TagDispatch(nm, tc, cases.toMap)
          }
        case k =>
          errors += SuiteError.Unsupported(ctx, s"unknown kind '${k.getOrElse("<missing>")}'")
          None
      }
    }

    val xAggChecks: List[AggConstraint] = xElements("x-graft-agg").flatMap { o =>
      val ctx = "x-graft-agg"
      def buckets = Option(o.get("saltBuckets")).filter(_.isNumber).map(_.asInt()).getOrElse(64)
      def drift3(mk: (String, String, Double, Double) => AggConstraint) =
        for {
          v <- xTxt(o, "valueCol", ctx); g <- xTxt(o, "groupCol", ctx)
          w <- xDouble(o, "binWidth", ctx); t <- xDouble(o, "threshold", ctx)
        } yield mk(v, g, w, t)
      txt(o, "kind") match {
        case Some("unique") =>
          xTxt(o, "col", ctx).map(Unique(_, xBool(o, "salted", default = false), buckets))
        case Some("uniqueTuple") =>
          Option(o.get("cols")).filter(_.isArray)
            .map(_.elements().asScala.map(_.asText()).toSeq)
            .orElse { errors += SuiteError.Unsupported(ctx, "missing 'cols' array"); None }
            .map(UniqueTuple(_, xBool(o, "salted", default = false), buckets))
        case Some("driftChiSquare") => drift3(DriftChiSquare(_, _, _, _))
        case Some("driftPSI") => drift3(DriftPSI(_, _, _, _))
        case Some("driftKS") => drift3(DriftKS(_, _, _, _))
        case Some("monotonicWithin") =>
          for (g <- xTxt(o, "groupCol", ctx); ord <- xTxt(o, "orderCol", ctx);
               v <- xTxt(o, "valueCol", ctx))
            yield MonotonicWithin(g, ord, v, xBool(o, "strict", default = false))
        case Some("refTable") =>
          for (c <- xTxt(o, "col", ctx); p <- xTxt(o, "dimPath", ctx);
               d <- xTxt(o, "dimCol", ctx))
            yield RefIntegrityTable(c, p, d, xBool(o, "broadcastDim", default = true),
              txt(o, "format").getOrElse(TableIO.defaultFormat))
        case Some("compliance") =>
          for {
            fp <- xLong(o, "minPassFp", ctx)
            innerO <- Option(o.get("inner")).filter(_.isObject).orElse {
              errors += SuiteError.Unsupported(ctx, "compliance: missing 'inner' object"); None
            }
            cl <- xTxt(innerO, "col", ctx)
            schemaN <- Option(innerO.get("schema")).filter(_.isObject).orElse {
              errors += SuiteError.Unsupported(ctx, "compliance: missing 'inner.schema'"); None
            }
            inner <- (compileProp(cl, schemaN, 1) match {
              case one :: Nil => Some(one)
              case Nil =>
                errors += SuiteError.Unsupported(ctx,
                  "compliance: inner schema compiled to no constraints"); None
              case many => Some(All(cl, many))
            })
          } yield Compliance(inner, fp, txt(o, "groupBy"))
        case k =>
          errors += SuiteError.Unsupported(ctx, s"unknown kind '${k.getOrElse("<missing>")}'")
          None
      }
    }

    val checks: List[RowConstraint] =
      required.toList.sorted.map(NonNull(_)) ++
        rootKeys ++
        rootDeps ++
        props.flatMap { case (col, sub) => compileProp(col, sub, 0, topLevel = true) } ++
        xRowChecks

    if (errors.nonEmpty) Left(errors.toList)
    else Right(ConstraintSuite(keyCol, checks, aggChecks = xAggChecks, nBuckets = nBuckets))
  }
}
