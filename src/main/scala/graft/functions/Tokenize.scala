package graft.functions

import scala.collection.mutable.ArrayBuffer

/** THE tokenizer of the text family — one definition shared by the
  * native expressions (shingles / minhash / simhash) and, via
  * [[graft.ops.TextOps.tokens]]'s column form, every composed operator
  * and DuckDB oracle:
  *
  *   - a Han / Hiragana / Katakana / Thai code point is a standalone
  *     token (those scripts write without word delimiters — character
  *     tokens are the standard dedup/quality granularity for them, cf.
  *     CCNet-style pipelines; Hangul is NOT split: Korean delimits
  *     words with spaces);
  *   - everything else splits on the RE2 `\s` whitespace set
  *     ([\t\n\f\r ] — NOT Java's `\s`, which also matches vertical
  *     tab) plus U+3000 IDEOGRAPHIC SPACE, the common CJK space
  *     character, so the DuckDB oracle reproduces tokenization exactly.
  *
  * Column-form equivalence: `tokens(text)` space-pads CJK code points
  * with a single regexp_replace, then splits on `[\s　]+` — the
  * same token stream this one-pass scanner produces.
  */
object Tokenize {

  /** Regex char class of the per-character scripts — Java syntax for
    * Spark columns. The DuckDB twin is [[CjkCharClassRe2]]. */
  val CjkCharClass = "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsThai}]"

  /** RE2 spelling of [[CjkCharClass]] for oracle SQL. */
  val CjkCharClassRe2 = "[\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Thai}]"

  /** Separator class shared by the column split and the oracle —
    * spelled EXPLICITLY as RE2's `\s` set ([\t\n\f\r ]) plus U+3000:
    * Java's `\s` additionally matches vertical tab (U+000B), which RE2
    * does not, so using `\s` on the Spark side would diverge from the
    * DuckDB oracle on any corpus containing a VT. */
  val SeparatorClass = "[\\t\\n\\f\\r 　]"

  def isSeparator(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '　'

  def isCjk(cp: Int): Boolean = {
    // Fast path: the overwhelmingly common case is ASCII / Latin text,
    // which never reaches UnicodeScript.of.
    if (cp < 0x0E00) false
    else {
      val sc = Character.UnicodeScript.of(cp)
      sc == Character.UnicodeScript.HAN ||
        sc == Character.UnicodeScript.HIRAGANA ||
        sc == Character.UnicodeScript.KATAKANA ||
        sc == Character.UnicodeScript.THAI
    }
  }

  /** One-pass tokenization (code-point aware: supplementary-plane Han
    * rides surrogate pairs). The `c < 0x0E00` fast path keeps
    * ASCII/Latin text on plain char compares — no codePointAt, no
    * script lookup (Thai U+0E00 is the lowest per-character script). */
  def split(s: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isSeparator(s.charAt(i))) i += 1
      if (i < n) {
        val c0 = s.charAt(i)
        if (c0 >= 0x0E00 && isCjk(s.codePointAt(i))) {
          val w = Character.charCount(s.codePointAt(i))
          out += s.substring(i, i + w)
          i += w
        } else {
          val start = i
          var stop = false
          while (i < n && !stop) {
            val c = s.charAt(i)
            if (isSeparator(c)) stop = true
            else if (c < 0x0E00) i += 1
            else {
              val p = s.codePointAt(i)
              if (isCjk(p)) stop = true else i += Character.charCount(p)
            }
          }
          out += s.substring(start, i)
        }
      }
    }
    out
  }
}
