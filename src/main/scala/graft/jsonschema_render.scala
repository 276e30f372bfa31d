package graft

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, BooleanNode, ObjectNode}

/** [[JsonSchema.parse]]'s inverse: render a [[ConstraintSuite]] back to
  * draft-07 JSON, so suites built in CODE — hand-written, or SUGGESTED by
  * [[Profiler.suggest]] from a clean corpus — can be frozen as versioned
  * config, diffed across versions ([[SuiteDiff]]), and reloaded next run.
  * The serialization format IS draft-07 (the reference's own schema
  * ecosystem), with engine-native checks that draft-07 cannot express
  * carried under the `x-graft-checks` / `x-graft-agg` vendor keywords the
  * loader reads back.
  *
  * Round-trip contract: `parse(render(s)) == s` exactly for suites in the
  * loader's canonical shape (anything `parse` produces, and code-built
  * suites that follow its ordering); other suites NORMALIZE — the first
  * render→parse cycle may rewrap combinator alternatives the way the loader
  * does, after which the cycle is a fixed point. Anything unrenderable
  * (RefIntegrity's embedded DataFrame, unresolved NamedRef, non-canonical
  * enum epsilon) is a LOUD `Left`, never a silent drop. (TagDispatch
  * serializes since round 5 — each case rides as a draft-07 subschema
  * under `x-graft-checks`.) Formats round-trip only under
  * `parse(validateFormats = true)`; DecimalRange only under the same
  * `tableSchema` that routed it.
  *
  * NOT carried by the document: `keyCol` and `nBuckets` are LOAD-TIME
  * parameters — [[SuiteRepo.load]] and [[JsonSchema.parse]] take them from
  * the caller, so a suite appended with non-default `nBuckets` must be
  * reloaded with the same value or bucket lineage (and [[SuiteDiff]]
  * against an in-memory candidate) will disagree. */
object JsonSchemaRender {
  import JsonSchema.F64Epsilon

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def render(suite: ConstraintSuite): Either[List[SuiteError], String] = {
    val errors = scala.collection.mutable.ListBuffer.empty[SuiteError]
    def err(ctx: String, msg: String): Unit =
      errors += SuiteError.Unsupported(ctx, msg)

    // top-level property nodes, in first-reference order (= the loader's
    // property compile order, so per-column groups round-trip in place)
    val props = scala.collection.mutable.LinkedHashMap.empty[String, ObjectNode]
    val rootRequired = scala.collection.mutable.SortedSet.empty[String]
    val rootDeps = scala.collection.mutable.SortedMap.empty[String, List[String]]
    var rootAddlFalse = false
    val xRow = mapper.createArrayNode()
    val xAgg = mapper.createArrayNode()

    def topNode(col: String): ObjectNode =
      props.getOrElseUpdate(col, mapper.createObjectNode())

    /** Property node for a possibly-dotted struct path (creates parents). */
    def nodeFor(path: String): ObjectNode =
      path.split("\\.").toList match {
        case head :: rest =>
          rest.foldLeft(topNode(head)) { (n, seg) =>
            getOrCreateObj(getOrCreateObj(n, "properties", path), seg, path)
          }
        case Nil => topNode(path)
      }

    def getOrCreateObj(n: ObjectNode, k: String, ctx: String): ObjectNode =
      n.get(k) match {
        case null =>
          val o = mapper.createObjectNode(); n.set[JsonNode](k, o); o
        case o: ObjectNode => o
        case _ =>
          err(ctx, s"keyword '$k' already holds a non-object form"); mapper.createObjectNode()
      }

    def setOnce(n: ObjectNode, k: String, v: JsonNode, ctx: String): Unit =
      if (n.has(k)) err(ctx, s"duplicate keyword '$k' — two constraints collide")
      else n.set[JsonNode](k, v)

    def num(d: Double): JsonNode = mapper.getNodeFactory.numberNode(d)
    def dec(b: BigDecimal): JsonNode = mapper.getNodeFactory.numberNode(b.bigDecimal)
    def txt(s: String): JsonNode = mapper.getNodeFactory.textNode(s)
    def intN(i: Int): JsonNode = mapper.getNodeFactory.numberNode(i)
    def longN(l: Long): JsonNode = mapper.getNodeFactory.numberNode(l)
    def boolN(b: Boolean): JsonNode = mapper.getNodeFactory.booleanNode(b)

    def valueNode(v: Any, ctx: String): JsonNode = v match {
      case s: String => txt(s)
      case l: Long => longN(l)
      case i: Int => intN(i)
      case d: Double => num(d)
      case b: Boolean => boolN(b)
      case other =>
        err(ctx, s"enum value of unrenderable runtime class ${other.getClass.getName}")
        txt(other.toString)
    }

    def typeNode(ts: Seq[String]): JsonNode =
      if (ts.length == 1) txt(ts.head)
      else { val a = mapper.createArrayNode(); ts.foreach(a.add); a }

    def boundKeys(n: ObjectNode, lo: Option[JsonNode], xLo: Boolean,
        hi: Option[JsonNode], xHi: Boolean, ctx: String): Unit = {
      lo.foreach(v => setOnce(n, if (xLo) "exclusiveMinimum" else "minimum", v, ctx))
      hi.foreach(v => setOnce(n, if (xHi) "exclusiveMaximum" else "maximum", v, ctx))
    }
    def finiteLo(d: Double): Option[JsonNode] =
      if (d == Double.NegativeInfinity) None else Some(num(d))
    def finiteHi(d: Double): Option[JsonNode] =
      if (d == Double.PositiveInfinity) None else Some(num(d))

    /** items in OBJECT form (error if the tuple form already claimed it). */
    def itemsObj(n: ObjectNode, ctx: String): ObjectNode = n.get("items") match {
      case null => getOrCreateObj(n, "items", ctx)
      case o: ObjectNode => o
      case _ => err(ctx, "items tuple and object forms on one column"); mapper.createObjectNode()
    }
    /** items in TUPLE form (error if the object form already claimed it). */
    def itemsTuple(n: ObjectNode, ctx: String): ArrayNode = n.get("items") match {
      case null => val a = mapper.createArrayNode(); n.set[JsonNode]("items", a); a
      case a: ArrayNode => a
      case _ => err(ctx, "items tuple and object forms on one column"); mapper.createArrayNode()
    }
    def growTuple(a: ArrayNode, upto: Int): Unit =
      while (a.size() < upto) a.add(true)

    /** The canonical enum-epsilon rule [[JsonSchema.parse]] applies — a
      * rendered enum must reproduce the same epsilon on reload. */
    def canonicalEps(values: Seq[Any]): Double = {
      val fractional = values.exists {
        case d: Double => d != math.floor(d) || d.isInfinite
        case _ => false
      }
      if (fractional && values.forall(_.isInstanceOf[Number])) F64Epsilon else 0.0
    }

    /** Unwrap the loader's conjunct wrapper: `All(col+suffix, cs)` → cs. */
    def unwrap(c: RowConstraint, col: String, suffix: String): Seq[RowConstraint] =
      c match {
        case All(n, cs) if n == col + suffix => cs
        case other => Seq(other)
      }

    /** A combinator alternative / branch as one subschema object (or the
      * boolean `false` schema for a lone Never). */
    def conjunct(col: String, cs: Seq[RowConstraint]): JsonNode = cs match {
      case Seq(Never(label)) =>
        if (label != s"never($col)")
          err(s"never($col)", s"nested Never must be labeled 'never($col)' to round-trip")
        BooleanNode.FALSE
      case _ =>
        val o = mapper.createObjectNode()
        cs.foreach(emit(o, _, col))
        o
    }

    /** Emit one constraint's keywords into `node` (a property subschema). */
    def emit(node: ObjectNode, c: RowConstraint, col: String): Unit = c match {
      case IsNull(cl) =>
        setOnce(node, "type", txt("null"), s"isnull($cl)")
      case JsonTypeIs(cl, ts, false, false) =>
        setOnce(node, "type", typeNode(ts), s"type($cl)")
      case JsonTypeIs(cl, ts, true, false) =>
        setOnce(itemsObj(node, s"elemType($cl)"), "type", typeNode(ts), s"elemType($cl)")
      case JsonTypeIs(cl, ts, false, true) =>
        val pp = getOrCreateObj(node, "patternProperties", s"mapValueType($cl)")
        setOnce(getOrCreateObj(pp, ".*", s"mapValueType($cl)"), "type", typeNode(ts),
          s"mapValueType($cl)")
      case j: JsonTypeIs => err(j.id, "element and mapValue both set")
      case Range(cl, lo, hi, xLo, xHi) =>
        boundKeys(node, finiteLo(lo), xLo, finiteHi(hi), xHi, s"range($cl)")
      case DecimalRange(cl, lo, hi, xLo, xHi) =>
        boundKeys(node, lo.map(dec), xLo, hi.map(dec), xHi, s"decimalRange($cl)")
      case MultipleOf(cl, m) => setOnce(node, "multipleOf", num(m), s"multipleOf($cl)")
      case Regex(cl, p) => setOnce(node, "pattern", txt(p), s"regex($cl)")
      case FormatCheck(cl, f) =>
        if (!Formats.known(f)) err(s"format($cl)", s"unknown format '$f' would not reload")
        setOnce(node, "format", txt(f), s"format($cl)")
      case LengthBounds(cl, lo, hi) =>
        lo.foreach(v => setOnce(node, "minLength", intN(v), s"length($cl)"))
        hi.foreach(v => setOnce(node, "maxLength", intN(v), s"length($cl)"))
      case EnumIn(cl, vs, eps) =>
        if (eps != canonicalEps(vs))
          err(s"enum($cl)", s"non-canonical epsilon $eps (loader derives " +
            s"${canonicalEps(vs)} for these values) — would not round-trip")
        val a = mapper.createArrayNode()
        vs.foreach(v => a.add(valueNode(v, s"enum($cl)")))
        setOnce(node, "enum", a, s"enum($cl)")
      case ArrayElemRange(cl, lo, hi) =>
        boundKeys(itemsObj(node, s"elemRange($cl)"), finiteLo(lo), xLo = false,
          finiteHi(hi), xHi = false, s"elemRange($cl)")
      case ArrayElemIn(cl, vs) =>
        val a = mapper.createArrayNode()
        vs.foreach(v => a.add(valueNode(v, s"elemIn($cl)")))
        setOnce(itemsObj(node, s"elemIn($cl)"), "enum", a, s"elemIn($cl)")
      case ArrayElemPattern(cl, p) =>
        setOnce(itemsObj(node, s"elemPattern($cl)"), "pattern", txt(p), s"elemPattern($cl)")
      case ArrayElemLength(cl, lo, hi) =>
        val it = itemsObj(node, s"elemLength($cl)")
        lo.foreach(v => setOnce(it, "minLength", intN(v), s"elemLength($cl)"))
        hi.foreach(v => setOnce(it, "maxLength", intN(v), s"elemLength($cl)"))
      case ArrayElemAtRange(cl, pos, lo, hi) =>
        val a = itemsTuple(node, s"elemAt($cl)")
        growTuple(a, pos)
        a.get(pos - 1) match {
          case b: BooleanNode if b.asBoolean() =>
            val o = mapper.createObjectNode()
            boundKeys(o, finiteLo(lo), xLo = false, finiteHi(hi), xHi = false, s"elemAt($cl)")
            a.set(pos - 1, o)
          case _ => err(s"elemAt($cl)", s"two constraints claim tuple position $pos")
        }
      case ArrayTailRange(cl, fromPos, lo, hi) =>
        val a = itemsTuple(node, s"elemTail($cl)")
        growTuple(a, fromPos - 1)
        if (a.size() != fromPos - 1)
          err(s"elemTail($cl)", s"tail from $fromPos conflicts with a ${a.size()}-slot tuple")
        val o = mapper.createObjectNode()
        boundKeys(o, finiteLo(lo), xLo = false, finiteHi(hi), xHi = false, s"elemTail($cl)")
        setOnce(node, "additionalItems", o, s"elemTail($cl)")
      case ArrayContainsValue(cl, v) =>
        setOnce(getOrCreateObj(node, "contains", s"contains($cl)"), "const",
          valueNode(v, s"contains($cl)"), s"contains($cl)")
      case ArrayContainsSchema(cl, preds) =>
        val ctx = s"containsSchema($cl)"
        val o = getOrCreateObj(node, "contains", ctx)
        // const-with-siblings parses back as a PREPENDED single-value
        // ElemEnum (loader contract) — render that shape via `const`
        val (constPart, rest) = preds match {
          case Seq(ElemEnum(Seq(one)), tail @ _*) if preds.size > 1 =>
            (Seq(ElemEnum(Seq(one))), tail)
          case _ => (Nil, preds)
        }
        constPart.foreach {
          case ElemEnum(Seq(one)) => setOnce(o, "const", valueNode(one, ctx), ctx)
          case _ => ()
        }
        rest.foreach {
          case ElemRange(lo, hi) =>
            boundKeys(o, finiteLo(lo), xLo = false, finiteHi(hi), xHi = false, ctx)
          case ElemEnum(vs) =>
            val a = mapper.createArrayNode()
            vs.foreach(v => a.add(valueNode(v, ctx)))
            setOnce(o, "enum", a, ctx)
          case ElemPatternPred(p) => setOnce(o, "pattern", txt(p), ctx)
          case ElemLengthPred(lo, hi) =>
            lo.foreach(v => setOnce(o, "minLength", intN(v), ctx))
            hi.foreach(v => setOnce(o, "maxLength", intN(v), ctx))
        }
        // the loader rebuilds preds in keyword order — reject an input
        // order it would not reproduce (silent reorder breaks round-trip)
        val parsedOrder = constPart ++
          rest.filter(_.isInstanceOf[ElemRange]) ++
          rest.filter(_.isInstanceOf[ElemEnum]) ++
          rest.filter(_.isInstanceOf[ElemPatternPred]) ++
          rest.filter(_.isInstanceOf[ElemLengthPred])
        if (parsedOrder != preds)
          err(ctx, "pred order is not the loader's canonical " +
            "(range, enum, pattern, length) — would silently reorder on reload")
      case ArraySizeBounds(cl, lo, hi) =>
        lo.foreach(v => setOnce(node, "minItems", intN(v), s"sizeBounds($cl)"))
        hi.foreach(v => setOnce(node, "maxItems", intN(v), s"sizeBounds($cl)"))
      case ArrayUniqueItems(cl) =>
        setOnce(node, "uniqueItems", boolN(true), s"uniqueItems($cl)")
      case MapValueRange(cl, keyPat, lo, hi) =>
        val pp = getOrCreateObj(node, "patternProperties", s"mapValueRange($cl)")
        boundKeys(getOrCreateObj(pp, keyPat, s"mapValueRange($cl)"),
          finiteLo(lo), xLo = false, finiteHi(hi), xHi = false, s"mapValueRange($cl)")
      case MapRequiredKeys(cl, req) =>
        val a = mapper.createArrayNode(); req.foreach(a.add)
        setOnce(node, "required", a, s"mapRequired($cl)")
      case MapKeysIn(cl, allowed) =>
        val a = mapper.createArrayNode(); allowed.foreach(a.add)
        setOnce(getOrCreateObj(node, "propertyNames", s"mapKeysIn($cl)"), "enum", a,
          s"mapKeysIn($cl)")
      case MapKeyPattern(cl, p) =>
        setOnce(getOrCreateObj(node, "propertyNames", s"mapKeyPattern($cl)"),
          "pattern", txt(p), s"mapKeyPattern($cl)")
      case MapKeyLength(cl, lo, hi) =>
        val pn = getOrCreateObj(node, "propertyNames", s"mapKeyLength($cl)")
        lo.foreach(v => setOnce(pn, "minLength", intN(v), s"mapKeyLength($cl)"))
        hi.foreach(v => setOnce(pn, "maxLength", intN(v), s"mapKeyLength($cl)"))
      case MapSizeBounds(cl, lo, hi) =>
        lo.foreach(v => setOnce(node, "minProperties", intN(v), s"mapSize($cl)"))
        hi.foreach(v => setOnce(node, "maxProperties", intN(v), s"mapSize($cl)"))
      case StructKeysIn(cl, allowed) if cl.nonEmpty =>
        setOnce(node, "additionalProperties", boolN(false), s"structKeys($cl)")
        val po = getOrCreateObj(node, "properties", s"structKeys($cl)")
        allowed.foreach(k => if (!po.has(k)) po.set[JsonNode](k, BooleanNode.TRUE))
      case All(name, cs) if name == col =>
        val a = mapper.createArrayNode()
        cs.foreach(x => a.add(conjunct(col, Seq(x))))
        setOnce(node, "allOf", a, s"allOf($col)")
      case AnyOf(name, alts) if name == col =>
        val a = mapper.createArrayNode()
        alts.foreach(alt => a.add(conjunct(col, unwrap(alt, col, ".alt"))))
        setOnce(node, "anyOf", a, s"anyOf($col)")
      case OneOf(name, alts) if name == col =>
        val a = mapper.createArrayNode()
        alts.foreach(alt => a.add(conjunct(col, unwrap(alt, col, ".alt"))))
        setOnce(node, "oneOf", a, s"oneOf($col)")
      case NotC(name, inner) if name == col =>
        setOnce(node, "not", conjunct(col, unwrap(inner, col, ".inner")), s"not($col)")
      case IfThenElse(name, i, t, e) if name == col =>
        setOnce(node, "if", conjunct(col, unwrap(i, col, ".if")), s"if($col)")
        setOnce(node, "then", conjunct(col, unwrap(t, col, ".then")), s"if($col)")
        e.foreach(x =>
          setOnce(node, "else", conjunct(col, unwrap(x, col, ".else")), s"if($col)"))
      case other =>
        err(other.id, s"no draft-07 rendering for ${other.getClass.getSimpleName} " +
          "in this position")
    }

    // ---- x-graft row-check rendering (engine-native leaves)
    def xObj(kind: String, fields: (String, JsonNode)*): Unit = {
      val o = mapper.createObjectNode()
      o.put("kind", kind)
      fields.foreach { case (k, v) => o.set[JsonNode](k, v) }
      xRow.add(o)
    }

    /** Root routing: required / dependencies / x-graft / per-column. */
    def route(c: RowConstraint): Unit = c match {
      case NonNull(cl) if !cl.contains(".") => rootRequired += cl
      case NonNull(cl) =>
        val segs = cl.split("\\.")
        val parent = nodeFor(segs.init.mkString("."))
        val req = parent.get("required") match {
          case null => val a = mapper.createArrayNode(); parent.set[JsonNode]("required", a); a
          case a: ArrayNode => a
          case _ => err(s"nonnull($cl)", "'required' holds a non-array"); mapper.createArrayNode()
        }
        req.add(segs.last)
      case StructKeysIn("", allowed) =>
        rootAddlFalse = true
        allowed.foreach(topNode(_)) // pre-create in order: props order IS the key list
      case IfThenElse(name, NonNull(k), All(name2, cs), None)
          if name == s"dep.$k" && name2 == name && cs.forall(_.isInstanceOf[NonNull]) =>
        if (rootDeps.contains(k)) err(name, s"duplicate root dependency for '$k'")
        rootDeps(k) = cs.collect { case NonNull(d) => d }.toList
      case TypeIs(cl, dt) => xObj("typeIs", "col" -> txt(cl), "dataType" -> txt(dt.json))
      case ColOrder(a, b, eq) =>
        xObj("colOrder", "a" -> txt(a), "b" -> txt(b), "allowEqual" -> boolN(eq))
      case LengthConsistent(a, l) =>
        xObj("lengthConsistent", "arrCol" -> txt(a), "lenCol" -> txt(l))
      case PadSuffixOnly(cl, p) => xObj("padSuffixOnly", "col" -> txt(cl), "pad" -> longN(p))
      case EndsWithToken(cl, e, p) =>
        xObj("endsWithToken", "col" -> txt(cl), "eos" -> longN(e), "pad" -> longN(p))
      case PadAwareLength(a, l, p) =>
        xObj("padAwareLength", "arrCol" -> txt(a), "lenCol" -> txt(l), "pad" -> longN(p))
      case SegmentLengthBounds(cl, s, lo, hi) =>
        xObj("segmentLengthBounds", "col" -> txt(cl), "sep" -> longN(s),
          "minLen" -> longN(lo), "maxLen" -> longN(hi))
      case TagDispatch(name, tagCol, cases) =>
        // each case's constraint rides as a column-scoped draft-07
        // subschema (the Compliance trick) — reparsed through compileProp
        val o = mapper.createObjectNode()
        o.put("kind", "tagDispatch"); o.put("name", name); o.put("tagCol", tagCol)
        val cs = mapper.createObjectNode()
        cases.toSeq.sortBy(_._1).foreach { case (tag, inner) =>
          colOf(inner) match {
            case Some(cl) => conjunct(cl, Seq(inner)) match {
              case on: ObjectNode if !on.isEmpty =>
                val e = mapper.createObjectNode()
                e.put("col", cl); e.set[JsonNode]("schema", on)
                cs.set[JsonNode](tag, e)
              case _ =>
                err(s"tag($name)", s"case '$tag' (${inner.id}) has no subschema form")
            }
            case None =>
              err(s"tag($name)", s"cannot attribute case '$tag' (${inner.id}) to a column")
          }
        }
        o.set[JsonNode]("cases", cs)
        xRow.add(o)
      case leaf: RowConstraint =>
        colOf(leaf) match {
          case Some(cl) => emit(nodeFor(cl), leaf, cl)
          case None => err(leaf.id,
            s"cannot attribute ${leaf.getClass.getSimpleName} to a column")
        }
    }

    /** The column a constraint's keywords live under. Combinators use their
      * name (the loader names property-level combinators after the column). */
    def colOf(c: RowConstraint): Option[String] = c match {
      case x: IsNull => Some(x.col)
      case x: JsonTypeIs => Some(x.col)
      case x: Range => Some(x.col)
      case x: DecimalRange => Some(x.col)
      case x: MultipleOf => Some(x.col)
      case x: Regex => Some(x.col)
      case x: FormatCheck => Some(x.col)
      case x: LengthBounds => Some(x.col)
      case x: EnumIn => Some(x.col)
      case x: ArrayElemRange => Some(x.col)
      case x: ArrayElemIn => Some(x.col)
      case x: ArrayElemPattern => Some(x.col)
      case x: ArrayElemLength => Some(x.col)
      case x: ArrayElemAtRange => Some(x.col)
      case x: ArrayTailRange => Some(x.col)
      case x: ArrayContainsValue => Some(x.col)
      case x: ArrayContainsSchema => Some(x.col)
      case x: ArraySizeBounds => Some(x.col)
      case x: ArrayUniqueItems => Some(x.col)
      case x: MapValueRange => Some(x.col)
      case x: MapRequiredKeys => Some(x.col)
      case x: MapKeysIn => Some(x.col)
      case x: MapKeyPattern => Some(x.col)
      case x: MapKeyLength => Some(x.col)
      case x: MapSizeBounds => Some(x.col)
      case x: StructKeysIn if x.col.nonEmpty => Some(x.col)
      case x: All => Some(x.name)
      case x: AnyOf => Some(x.name)
      case x: OneOf => Some(x.name)
      case x: NotC => Some(x.name)
      case x: IfThenElse => Some(x.name)
      case _ => None
    }

    if (suite.definitions.nonEmpty)
      err("definitions", "render requires a resolved suite — definitions/NamedRef " +
        "are substituted at compile; render the resolved form")
    suite.rowChecks.foreach(route)

    suite.aggChecks.foreach {
      case Unique(cl, salted, buckets) =>
        val o = mapper.createObjectNode()
        o.put("kind", "unique"); o.put("col", cl)
        o.put("salted", salted); o.put("saltBuckets", buckets)
        xAgg.add(o)
      case UniqueTuple(cols, salted, buckets) =>
        val o = mapper.createObjectNode()
        o.put("kind", "uniqueTuple")
        val a = mapper.createArrayNode(); cols.foreach(a.add)
        o.set[JsonNode]("cols", a)
        o.put("salted", salted); o.put("saltBuckets", buckets)
        xAgg.add(o)
      case d: DriftChiSquare =>
        xAgg.add(driftNode("driftChiSquare", d.valueCol, d.groupCol, d.binWidth, d.threshold))
      case d: DriftPSI =>
        xAgg.add(driftNode("driftPSI", d.valueCol, d.groupCol, d.binWidth, d.threshold))
      case d: DriftKS =>
        xAgg.add(driftNode("driftKS", d.valueCol, d.groupCol, d.binWidth, d.threshold))
      case MonotonicWithin(g, ord, v, strict) =>
        val o = mapper.createObjectNode()
        o.put("kind", "monotonicWithin"); o.put("groupCol", g)
        o.put("orderCol", ord); o.put("valueCol", v); o.put("strict", strict)
        xAgg.add(o)
      case RefIntegrityTable(cl, dimPath, dimCol, bc, fmt) =>
        val o = mapper.createObjectNode()
        o.put("kind", "refTable"); o.put("col", cl); o.put("dimPath", dimPath)
        o.put("dimCol", dimCol); o.put("broadcastDim", bc); o.put("format", fmt)
        xAgg.add(o)
      case Compliance(inner, minPassFp, groupBy) =>
        // the inner rides as a column-scoped draft-07 SUBSCHEMA — the same
        // dialect as everything else, reparsed through compileProp on load
        colOf(inner) match {
          case Some(cl) =>
            conjunct(cl, Seq(inner)) match {
              case schemaNode: ObjectNode if !schemaNode.isEmpty =>
                val o = mapper.createObjectNode()
                o.put("kind", "compliance"); o.put("minPassFp", minPassFp)
                groupBy.foreach(g => o.put("groupBy", g))
                val in = mapper.createObjectNode()
                in.put("col", cl); in.set[JsonNode]("schema", schemaNode)
                o.set[JsonNode]("inner", in)
                xAgg.add(o)
              case _ =>
                err(s"compliance", s"inner ${inner.id} has no subschema form")
            }
          case None => err("compliance", s"cannot attribute inner ${inner.id} to a column")
        }
      case other =>
        err(other.id, s"no serialization for ${other.getClass.getSimpleName} — " +
          "referential checks carry a DataFrame and must be re-attached at load")
    }

    if (errors.nonEmpty) Left(errors.toList)
    else {
      val root = mapper.createObjectNode()
      root.put("type", "object")
      if (rootRequired.nonEmpty) {
        val a = mapper.createArrayNode(); rootRequired.foreach(a.add)
        root.set[JsonNode]("required", a)
      }
      if (rootAddlFalse) root.put("additionalProperties", false)
      if (rootDeps.nonEmpty) {
        val d = mapper.createObjectNode()
        rootDeps.foreach { case (k, cols) =>
          val a = mapper.createArrayNode(); cols.foreach(a.add)
          d.set[JsonNode](k, a)
        }
        root.set[JsonNode]("dependencies", d)
      }
      val p = mapper.createObjectNode()
      props.foreach { case (k, n) => p.set[JsonNode](k, n) }
      root.set[JsonNode]("properties", p)
      if (xRow.size() > 0) root.set[JsonNode]("x-graft-checks", xRow)
      if (xAgg.size() > 0) root.set[JsonNode]("x-graft-agg", xAgg)
      Right(mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    }
  }

  private def driftNode(kind: String, valueCol: String, groupCol: String,
      binWidth: Double, threshold: Double): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("kind", kind); o.put("valueCol", valueCol); o.put("groupCol", groupCol)
    o.put("binWidth", binWidth); o.put("threshold", threshold)
    o
  }
}
