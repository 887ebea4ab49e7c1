package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Per-column scalar transform chains — the reference's `transform(*fields)`
  * DSL (T1–T3, /root/reference/easy_etl/__init__.py:157-195).
  *
  * The reference records `(method, args)` tuples via `__getattr__` and
  * resolves them against the value's *runtime* type at execution, raising
  * `AttributeError` mid-load on a mismatch. Here each chain step is a
  * `(Column, DataType) => Column` recorded at staging time against a fixed
  * dispatch surface — unknown methods fail at staging, and every step
  * compiles to a Catalyst expression inside a single projection
  * (whole-stage-codegen friendly; no per-row interpretation).
  *
  * Semantics preserved from the reference (verified in SURVEY.md §2.1/T1):
  *   - `transform(f1, f2)` re-targets the field list; previously staged
  *     chains for other fields are RETAINED and accumulate
  *     (easy_etl/__init__.py:27-29, 170-177).
  *   - Chained calls compose left-to-right per field.
  *   - Application across fields follows first-staged order
  *     (dict-insertion order in the reference, :179-182).
  */
class TransformPipeline {

  /** One chain step; receives the column expression so far plus the field's
    * ORIGINAL schema type (used by type-aware steps like falsy `default`).
    */
  type Step = (Column, DataType) => Column

  private var fields: Seq[String] = Seq.empty
  private val chains = mutable.LinkedHashMap.empty[String, Vector[Step]]

  /** Re-target the chain at `fs` (reference `transform(*fields)`). */
  def on(fs: Seq[String]): this.type = { fields = fs; this }

  private def add(step: Step): this.type = {
    fields.foreach { f => chains(f) = chains.getOrElse(f, Vector.empty) :+ step }
    this
  }

  // ---- Python-str-method surface (T1) ----------------------------------
  def upper(): this.type = add((c, _) => org.apache.spark.sql.functions.upper(c))
  def lower(): this.type = add((c, _) => org.apache.spark.sql.functions.lower(c))
  def strip(): this.type = add((c, _) => trim(c))
  def lstrip(): this.type = add((c, _) => ltrim(c))
  def rstrip(): this.type = add((c, _) => rtrim(c))

  /** Python `str.replace` is a LITERAL replace, not regex — quote both sides. */
  def replace(from: String, to: String): this.type =
    add((c, _) => regexp_replace(c,
      java.util.regex.Pattern.quote(from),
      java.util.regex.Matcher.quoteReplacement(to)))

  /** Python `str.title`: initcap each word (lowering the rest first). */
  def title(): this.type =
    add((c, _) => initcap(org.apache.spark.sql.functions.lower(c)))

  /** Python `str.capitalize`: first char upper, rest lower. */
  def capitalize(): this.type = add((c, _) =>
    concat(org.apache.spark.sql.functions.upper(substring(c, 1, 1)),
           org.apache.spark.sql.functions.lower(expr_substr_from2(c))))

  private def expr_substr_from2(c: Column): Column = c.substr(lit(2), length(c))

  def zfill(width: Int): this.type =
    add((c, _) => lpad(c.cast(StringType), width, "0"))

  /** Python `str.ljust`/`str.rjust`: pad to width, but NEVER truncate a
    * longer value (Spark's rpad/lpad truncate — guard on length). */
  def ljust(width: Int, fill: String = " "): this.type = add { (c, _) =>
    val s = c.cast(StringType)
    when(length(s) >= width, s).otherwise(rpad(s, width, fill))
  }
  def rjust(width: Int, fill: String = " "): this.type = add { (c, _) =>
    val s = c.cast(StringType)
    when(length(s) >= width, s).otherwise(lpad(s, width, fill))
  }

  /** ASCII `str.swapcase` via per-char translate of a–z/A–Z (non-ASCII
    * cased letters pass through unchanged, unlike Python's full-Unicode
    * swapcase). */
  def swapcase(): this.type = {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    add((c, _) => translate(c, lower + upper, upper + lower))
  }

  /** Python 3.9 `str.removeprefix`/`removesuffix` (literal, at most once). */
  def removeprefix(p: String): this.type = add((c, _) =>
    when(c.startsWith(p), c.substr(lit(p.length + 1), length(c))).otherwise(c))
  def removesuffix(s: String): this.type = add((c, _) =>
    when(c.endsWith(s), c.substr(lit(1), length(c) - s.length)).otherwise(c))

  /** Python `str.startswith`/`endswith` — the chain becomes boolean. */
  def startswith(p: String): this.type = add((c, _) => c.startsWith(p))
  def endswith(s: String): this.type = add((c, _) => c.endsWith(s))

  /** Python `str.strip(chars)` — strip any of the chars in `chars` from
    * both ends (Spark's trim-with-trimString has the same char-set
    * semantics). */
  def strip(chars: String): this.type = add((c, _) => trim(c, chars))

  /** Python `str.center(width, fill)`, including CPython's placement quirk:
    * with an odd margin the extra fill char goes left iff `width` is odd
    * (left = margin/2 + (margin & width & 1)). Never truncates. */
  def center(width: Int, fill: String = " "): this.type = {
    // Python raises TypeError for a non-single-char fill; fail at staging
    require(fill.length == 1, s"center fill must be exactly one char: '$fill'")
    add { (c, _) =>
    val s = c.cast(StringType)
    val marg = lit(width) - length(s)
    val left = floor(marg / 2).cast(IntegerType) +
      marg.cast(IntegerType).bitwiseAND(lit(width)).bitwiseAND(lit(1))
    // column-length padding via substr over a width-sized fill literal
    // (functions.lpad/rpad only take literal widths)
    val pad = lit(fill * width)
    when(length(s) >= width, s)
      .otherwise(concat(pad.substr(lit(1), left), s,
        pad.substr(lit(1), marg.cast(IntegerType) - left)))
    }
  }

  /** Python `str.count(sub)`: non-overlapping occurrence count. */
  def count(sub: String): this.type = {
    require(sub.nonEmpty, "count of empty substring not supported")
    add((c, _) => ((length(c) - length(regexp_replace(c,
      java.util.regex.Pattern.quote(sub), ""))) / sub.length).cast(LongType))
  }

  /** Python `str.find(sub)` / `str.rfind(sub)`: 0-based index of the
    * first/last occurrence, −1 when absent. */
  def find(sub: String): this.type =
    add((c, _) => (instr(c, sub) - 1).cast(LongType))
  def rfind(sub: String): this.type = add { (c, _) =>
    // search the reversed haystack for the reversed needle: 1-based hit at
    // p ⇒ the last occurrence starts at 0-based (len − p − |sub| + 1)
    val p = instr(reverse(c), sub.reverse)
    when(p === 0, lit(-1L))
      .otherwise((length(c) - p - lit(sub.length) + 1).cast(LongType))
  }

  /** Python `str.index(sub)`: like find but errors when absent (the
    * reference would raise ValueError mid-load). */
  def index(sub: String): this.type = add { (c, _) =>
    val p = instr(c, sub)
    when(p === 0, raise_error(concat(lit("substring not found: "), c)))
      .otherwise((p - 1).cast(LongType))
  }

  /** Python `str.casefold` — ASCII approximation (= lower; full Unicode
    * casefolding differs only for locale-special chars like ß). */
  def casefold(): this.type = add((c, _) => org.apache.spark.sql.functions.lower(c))

  /** Python `int.bit_count` / `int.bit_length` (non-negative ints — the
    * reference dispatches int builtins too). bit_length goes through the
    * binary-string length instead of log2 so both engines stay integer-exact
    * (log2 of a power of two is not reliably exact in doubles). */
  def bit_count(): this.type =
    add((c, _) => org.apache.spark.sql.functions.bit_count(c).cast(LongType))
  def bit_length(): this.type = add((c, _) =>
    when(c === 0, lit(0L)).otherwise(length(bin(c)).cast(LongType)))

  // Python str predicates (ASCII character classes; the chain becomes
  // boolean). isdigit/isalpha/isalnum/isspace require non-empty + all
  // chars in class; islower/isupper require ≥1 cased char and all cased
  // chars in the given case.
  def isdigit(): this.type = add((c, _) => c.rlike("^[0-9]+$"))
  def isalpha(): this.type = add((c, _) => c.rlike("^[A-Za-z]+$"))
  def isalnum(): this.type = add((c, _) => c.rlike("^[A-Za-z0-9]+$"))
  def isspace(): this.type = add((c, _) => c.rlike("^\\s+$"))
  def islower(): this.type = add((c, _) =>
    c.rlike("[a-z]") && !c.rlike("[A-Z]"))
  def isupper(): this.type = add((c, _) =>
    c.rlike("[A-Z]") && !c.rlike("[a-z]"))

  /** Python `str.expandtabs(tabsize)`: each tab advances to the next
    * multiple of `tabsize`, with the column counter resetting after `\n`
    * and `\r` (CPython semantics). Columnar: split on tabs, fold the
    * segments with `aggregate`, padding each boundary from the column
    * position of the accumulated text — stays a single codegen'd
    * expression, no UDF. */
  def expandtabs(tabsize: Int = 8): this.type = {
    require(tabsize > 0, s"tabsize must be positive: $tabsize")
    add { (c0, _) =>
      val c = c0.cast(StringType)
      val parts = split(c, "\t", -1)
      // chars since the last \n or \r (either resets the column): distance
      // from the end to the nearest newline-ish char in the reversed text
      def colpos(x: Column): Column = coalesce(
        least(nullif(instr(reverse(x), "\n"), lit(0)),
              nullif(instr(reverse(x), "\r"), lit(0))) - 1,
        length(x))
      val padSrc = lit(" " * tabsize)
      val folded = aggregate(
        slice(parts, lit(1), size(parts) - 1),
        lit(""),
        (acc, p) => {
          val upTo = concat(acc, p)
          concat(upTo, padSrc.substr(lit(1), lit(tabsize) - colpos(upTo) % tabsize))
        })
      concat(folded, element_at(parts, size(parts)))
    }
  }

  /** Python `str.format(args…)` — the auto-numbered `{}` subset: the COLUMN
    * VALUE is the template (that is what the reference's value-method
    * dispatch does), each arg fills the next `{}` in order. Faithful to
    * CPython: surplus args are ignored; more `{}` than args raises
    * (Python's IndexError), surfaced as a runtime error. The template is
    * split on `{}` ONCE and interleaved with the args, so argument VALUES
    * containing braces are never re-scanned as placeholders (sequential
    * replace-first would consume them). */
  def format(args: Any*): this.type = add { (c0, _) =>
    val c = c0.cast(StringType)
    val parts = split(c, java.util.regex.Pattern.quote("{}"), -1)
    val nPh = size(parts) - 1 // placeholders in this row's template
    val tooFew =
      raise_error(concat(lit("format: not enough arguments for template: "), c))
    if (args.isEmpty)
      when(nPh > 0, tooFew).otherwise(c)
    else {
      val argArr = array(args.map(a => lit(a.toString)): _*)
      val filled = concat(element_at(parts, 1),
        aggregate(sequence(lit(2), size(parts)), lit(""),
          (acc, i) => concat(acc, element_at(argArr, i - 1), element_at(parts, i))))
      when(nPh > args.length, tooFew)
        .when(nPh === 0, c)
        .otherwise(filled)
    }
  }

  /** Python `str.partition(sep)` / `rpartition(sep)`: the chain becomes a
    * 3-element array (head, sep, tail) — (value, "", "") / ("", "", value)
    * when the separator is absent, matching CPython. Compose with
    * [[map]] (e.g. `concat_ws`) to flatten back to a string column. */
  def partition(sep: String): this.type = {
    require(sep.nonEmpty, "empty separator")
    add { (c0, _) =>
      val c = c0.cast(StringType)
      val p = instr(c, sep)
      when(p === 0, array(c, lit(""), lit("")))
        .otherwise(array(c.substr(lit(1), p - 1), lit(sep),
          c.substr(p + sep.length, length(c))))
    }
  }
  def rpartition(sep: String): this.type = {
    require(sep.nonEmpty, "empty separator")
    add { (c0, _) =>
      val c = c0.cast(StringType)
      val rp = instr(reverse(c), sep.reverse)
      val start = length(c) - rp - sep.length + 2 // 1-based start of last hit
      when(rp === 0, array(lit(""), lit(""), c))
        .otherwise(array(c.substr(lit(1), start - 1), lit(sep),
          c.substr(start + sep.length, length(c))))
    }
  }

  def substringOf(pos: Int, len: Int): this.type = add((c, _) => substring(c, pos, len))

  def cast(dt: DataType): this.type = add((c, _) => c.cast(dt))

  /** Escape hatch for any `Column => Column` (stays in codegen). */
  def map(f: Column => Column): this.type = add((c, _) => f(c))

  // ---- default (T2): FALSY-coalesce, not null-coalesce ------------------
  /** The reference's `default` replaces Python-falsy values — `data or dflt`
    * (easy_etl/__init__.py:145-148, verified): null always; "" for strings;
    * 0 for numerics; false for booleans. Type-aware `when/otherwise`,
    * no custom Expression needed (SURVEY.md §4).
    */
  def default(value: Any): this.type = add { (c, dt) =>
    val falsy: Column = dt match {
      case StringType                       => c.isNull || c === lit("")
      case _: NumericType                   => c.isNull || c === lit(0)
      case BooleanType                      => c.isNull || c === lit(false)
      case _                                => c.isNull
    }
    when(falsy, lit(value)).otherwise(c)
  }

  // ---- func (T3): arbitrary scalar UDF -----------------------------------
  def func(u: UserDefinedFunction): this.type = add((c, _) => u(c))

  // ---- execution ---------------------------------------------------------
  /** Materialize all staged chains as ONE projection over `df`. */
  def apply(df: DataFrame): DataFrame = {
    if (chains.isEmpty) return df
    val schema = df.schema
    val outCols = df.columns.map { name =>
      chains.get(name) match {
        case Some(steps) =>
          val dt = schema(name).dataType
          steps.foldLeft(col(name))((acc, s) => s(acc, dt)).as(name)
        case None => col(name)
      }
    }
    // Chains on fields absent from df mirror the reference's behavior of
    // only touching keys present in the row (easy_etl/__init__.py:180-182).
    df.select(outCols.toIndexedSeq: _*)
  }

  def isEmpty: Boolean = chains.isEmpty

  def reset(): Unit = { fields = Seq.empty; chains.clear() }
}
