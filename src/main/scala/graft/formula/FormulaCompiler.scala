package graft.formula

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Stats

/** Compiles the reference's formula strings
  * (`/root/reference/bid_evaluation/criteria.py:105-151`, evaluated there
  * per-row with `simpleeval`) into a single Catalyst `Column` tree.
  *
  * Grammar (the Python-expression subset simpleeval exposes):
  *
  * {{{
  * ternary    := or_expr [ 'if' or_expr 'else' ternary ]
  * or_expr    := and_expr ( 'or' and_expr )*
  * and_expr   := not_expr ( 'and' not_expr )*
  * not_expr   := 'not' not_expr | comparison
  * comparison := additive ( ('<'|'<='|'>'|'>='|'=='|'!=') additive )*
  * additive   := term ( ('+'|'-') term )*
  * term       := factor ( ('*'|'/'|'%') factor )*
  * factor     := ('-'|'+') factor | power
  * power      := atom [ '**' factor ]          // right-assoc
  * atom       := NUMBER | NAME | NAME '(' args ')' | '(' ternary ')'
  * }}}
  *
  * Names in scope: `value` (the row's value), the six statistics
  * `min/max/mean/median/std` (+ `q25`/`q75` for convenience), and user
  * variables. Functions: `abs, min, max, sqrt, log, log10, exp, clip`
  * (`criteria.py:130-135`). Compiling to stock `Column`s keeps the whole
  * expression inside Catalyst constant folding and whole-stage codegen — no
  * per-row interpreter, no UDF.
  *
  * Python-semantics notes:
  *   - booleans coerce to 1.0/0.0 in numeric position (`float(True)`), and
  *     numerics coerce to truthiness (`x != 0`) in boolean position;
  *   - `a and b` / `a or b` return an *operand* (short-circuit value);
  *   - chained comparisons `a < b < c` mean `(a < b) and (b < c)`.
  */
object FormulaCompiler {

  /** @throws IllegalArgumentException on syntax errors or unknown names;
    *         the caller ([[graft.criteria.FormulaCriterion]]) maps that to
    *         all-zero scores, matching the reference's error-to-0 contract.
    */
  def compile(
      formula: String,
      value: Column,
      stats: Stats,
      variables: Map[String, Double]
  ): Column = {
    val names: Map[String, Column] =
      Map(
        "value" -> value,
        "min" -> lit(stats.min),
        "max" -> lit(stats.max),
        "mean" -> lit(stats.mean),
        "median" -> lit(stats.median),
        "std" -> lit(stats.std),
        "q25" -> lit(stats.q25),
        "q75" -> lit(stats.q75)
      ) ++ variables.map { case (k, v) => k -> lit(v) }
    new Parser(Lexer.tokenize(formula), names, variables).parseAll().num
  }

  // ---------------------------------------------------------------- lexer

  private sealed trait Tok
  private final case class Num(v: Double) extends Tok
  private final case class Name(s: String) extends Tok
  private final case class Op(s: String) extends Tok

  private object Lexer {
    private val twoChar = Set("**", "<=", ">=", "==", "!=")
    def tokenize(s: String): Vector[Tok] = {
      val out = Vector.newBuilder[Tok]
      var i = 0
      while (i < s.length) {
        val c = s(i)
        if (c.isWhitespace) i += 1
        else if (c.isDigit || (c == '.' && i + 1 < s.length && s(i + 1).isDigit)) {
          val start = i
          while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
          if (i < s.length && (s(i) == 'e' || s(i) == 'E')) {
            var j = i + 1
            if (j < s.length && (s(j) == '+' || s(j) == '-')) j += 1
            if (j < s.length && s(j).isDigit) {
              i = j
              while (i < s.length && s(i).isDigit) i += 1
            }
          }
          out += Num(s.substring(start, i).toDouble)
        } else if (c.isLetter || c == '_') {
          val start = i
          while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
          out += Name(s.substring(start, i))
        } else if (i + 1 < s.length && twoChar(s.substring(i, i + 2))) {
          out += Op(s.substring(i, i + 2)); i += 2
        } else if ("+-*/%<>(),".indexOf(c) >= 0) {
          out += Op(c.toString); i += 1
        } else {
          throw new IllegalArgumentException(
            s"Unexpected character '$c' in formula: $s")
        }
      }
      out.result()
    }
  }

  // --------------------------------------------------------------- parser

  /** A compiled node: the numeric view, whether it is natively boolean
    * (for Python bool<->number coercion), and — when the subtree is built
    * purely from literals and user variables — its compile-time value.
    *
    * Constness drives Python-faithful arithmetic-error semantics: the
    * reference evaluates rows as NUMPY scalars, where x/0 yields +-inf
    * (clipped later), while a PYTHON-number division like the literal
    * '1/0' raises ZeroDivisionError (mapped to a 0.0 score). Literals and
    * user variables are Python numbers; `value` and the statistics names
    * are numpy scalars. */
  private final case class Node(
      col: Column, isBool: Boolean, const: Option[Double] = None) {
    def num: Column = if (isBool) col.cast("double") else col
    def bool: Column = if (isBool) col else col =!= lit(0.0)
  }

  private final class Parser(
      toks: Vector[Tok],
      names: Map[String, Column],
      constNames: Map[String, Double]) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def expectOp(s: String): Unit = next() match {
      case Op(`s`) => ()
      case other   => fail(s"expected '$s' but found $other")
    }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"Formula parse error: $msg")

    def parseAll(): Node = {
      val n = ternary()
      if (pos != toks.length) fail(s"trailing tokens at position $pos")
      n
    }

    private def ternary(): Node = {
      val body = orExpr()
      peek match {
        case Some(Name("if")) =>
          next()
          val cond = orExpr()
          next() match {
            case Name("else") => ()
            case other        => fail(s"expected 'else', found $other")
          }
          val orelse = ternary()
          Node(when(cond.bool, body.num).otherwise(orelse.num), isBool = false)
        case _ => body
      }
    }

    private def orExpr(): Node = {
      var left = andExpr()
      while (peek.contains(Name("or"))) {
        next()
        val right = andExpr()
        // Python returns the first truthy operand (else the last operand)
        left = Node(when(left.bool, left.num).otherwise(right.num), isBool = false)
      }
      left
    }

    private def andExpr(): Node = {
      var left = notExpr()
      while (peek.contains(Name("and"))) {
        next()
        val right = notExpr()
        left = Node(when(left.bool, right.num).otherwise(left.num), isBool = false)
      }
      left
    }

    private def notExpr(): Node = peek match {
      case Some(Name("not")) =>
        next()
        Node(!notExpr().bool, isBool = true)
      case _ => comparison()
    }

    private def comparison(): Node = {
      var left = additive()
      var chain: Option[Column] = None
      var done = false
      while (!done) {
        peek match {
          case Some(Op(op @ ("<" | "<=" | ">" | ">=" | "==" | "!="))) =>
            next()
            val right = additive()
            val cmp = op match {
              case "<"  => left.num < right.num
              case "<=" => left.num <= right.num
              case ">"  => left.num > right.num
              case ">=" => left.num >= right.num
              case "==" => left.num === right.num
              case "!=" => left.num =!= right.num
            }
            chain = Some(chain.map(_ && cmp).getOrElse(cmp))
            left = right
          case _ => done = true
        }
      }
      chain.map(c => Node(c, isBool = true)).getOrElse(left)
    }

    private def constOp(a: Node, b: Node)(f: (Double, Double) => Double): Option[Double] =
      for (x <- a.const; y <- b.const) yield f(x, y)

    private def additive(): Node = {
      var left = term()
      var done = false
      while (!done) {
        peek match {
          case Some(Op("+")) =>
            next(); val r = term()
            left = Node(left.num + r.num, false, constOp(left, r)(_ + _))
          case Some(Op("-")) =>
            next(); val r = term()
            left = Node(left.num - r.num, false, constOp(left, r)(_ - _))
          case _ => done = true
        }
      }
      left
    }

    private def term(): Node = {
      var left = factor()
      var done = false
      while (!done) {
        peek match {
          case Some(Op("*")) =>
            next(); val r = factor()
            left = Node(left.num * r.num, false, constOp(left, r)(_ * _))
          case Some(Op("/")) =>
            next(); val r = factor()
            left = (left.const, r.const) match {
              // Python-number division: literal 0 divisor raises -> the
              // caller maps the compile failure to all-zero scores
              case (Some(a), Some(b)) =>
                if (b == 0.0) fail("division by zero in constant expression")
                Node(lit(a / b), false, Some(a / b))
              // numpy semantics: x/0 -> +-inf (0/0 -> NaN), else IEEE
              case _ =>
                val d = when(r.num === lit(0.0),
                  when(left.num > 0, lit(Double.PositiveInfinity))
                    .when(left.num < 0, lit(Double.NegativeInfinity))
                    .otherwise(lit(Double.NaN)))
                  .otherwise(left.num / r.num)
                Node(d, false)
            }
          case Some(Op("%")) =>
            next(); val r = factor()
            left = (left.const, r.const) match {
              case (Some(a), Some(b)) =>
                if (b == 0.0) fail("modulo by zero in constant expression")
                Node(lit(pyMod(a, b)), false, Some(pyMod(a, b)))
              // numpy mod: sign of the DIVISOR (a - floor(a/b)*b); x%0 -> NaN
              case _ =>
                val m = when(r.num === lit(0.0), lit(Double.NaN))
                  .otherwise(left.num - floor(left.num / r.num) * r.num)
                Node(m, false)
            }
          case _ => done = true
        }
      }
      left
    }

    /** Python float modulo: result takes the divisor's sign. */
    private def pyMod(a: Double, b: Double): Double = {
      val r = a % b
      if (r != 0.0 && ((r < 0) != (b < 0))) r + b else r
    }

    private def factor(): Node = peek match {
      case Some(Op("-")) =>
        next(); val inner = factor()
        Node(-inner.num, isBool = false, inner.const.map(-_))
      case Some(Op("+")) => next(); factor()
      case _             => power()
    }

    private def power(): Node = {
      val base = atom()
      peek match {
        case Some(Op("**")) =>
          next()
          val exp = factor() // right-assoc; exponent may carry unary minus
          val const = (base.const, exp.const) match {
            case (Some(a), Some(b)) =>
              if (a == 0.0 && b < 0)
                fail("zero cannot be raised to a negative power") // Python raises
              Some(math.pow(a, b))
            case _ => None
          }
          Node(pow(base.num, exp.num), isBool = false, const)
        case _ => base
      }
    }

    private def atom(): Node = next() match {
      case Num(v) => Node(lit(v), isBool = false, const = Some(v))
      case Op("(") =>
        val inner = ternary()
        expectOp(")")
        inner
      case Name(fn) if peek.contains(Op("(")) =>
        next()
        val args = Vector.newBuilder[Node]
        if (!peek.contains(Op(")"))) {
          args += ternary()
          while (peek.contains(Op(","))) { next(); args += ternary() }
        }
        expectOp(")")
        call(fn, args.result())
      case Name(id) =>
        names.get(id) match {
          // user variables are Python numbers -> compile-time constants;
          // `value` and the statistics are numpy scalars -> runtime columns
          case Some(c) =>
            Node(c, isBool = false, const = constNames.get(id))
          case None => fail(s"unknown name '$id'")
        }
      case other => fail(s"unexpected token $other")
    }

    /** Function environment (`/root/reference/bid_evaluation/criteria.py:130-135`). */
    private def call(fn: String, args: Vector[Node]): Node = {
      def nums = args.map(_.num)
      (fn, args.length) match {
        case ("abs", 1)   => Node(abs(nums(0)), false)
        case ("sqrt", 1)  => Node(sqrt(nums(0)), false)
        case ("log", 1)   => Node(log(nums(0)), false)
        case ("log10", 1) => Node(log10(nums(0)), false)
        case ("exp", 1)   => Node(exp(nums(0)), false)
        case ("min", n) if n >= 2 => Node(least(nums: _*), false)
        case ("max", n) if n >= 2 => Node(greatest(nums: _*), false)
        case ("clip", 3) =>
          // Python: clip = lambda x, lo, hi: max(lo, min(hi, x))
          Node(graft.criteria.Clip.clip(nums(0), nums(1), nums(2)), false)
        case _ =>
          fail(s"unknown function '$fn' with ${args.length} argument(s)")
      }
    }
  }
}
