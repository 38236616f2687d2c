package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** CNPJ (Brazilian company registry number) check-digit validation — the
  * domain scalar for the reference's data (`cnpj_basico`+`ordem`+`dv` columns,
  * FIXTURES.md §A). Public mod-11 algorithm over 14 digits.
  *
  * Static methods so generated code can call them directly (see
  * [[CnpjValid]]'s `doGenCode`).
  */
object Cnpj {
  private val W1 = Array(5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2)
  private val W2 = Array(6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2)

  def isValid(s: UTF8String): Boolean = s != null && isValidStr(s.toString)

  def isValidStr(raw: String): Boolean = {
    if (raw == null) return false
    // ASCII digits only: Character.isDigit also accepts fullwidth /
    // Arabic-Indic digits, which pass the length gate and then feed
    // charAt(i) - '0' values like 65249 into the mod-11 sums — an
    // arbitrary verdict instead of a clean rejection. And only the KNOWN
    // formatting separators ('.', '/', '-', space) may ride along: a
    // filter that stripped ALL non-digits validated arbitrary junk whose
    // embedded digits happened to check out ('11x222x333x0001x81' — r14
    // review), defeating the data-quality flag this exists to be
    val sb = new java.lang.StringBuilder(14)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c >= '0' && c <= '9') sb.append(c)
      else if (c != '.' && c != '/' && c != '-' && c != ' ') return false
      i += 1
    }
    val digits = sb.toString
    if (digits.length != 14) return false
    if (digits.forall(_ == digits.head)) return false // 00000000000000 etc.
    // ONE mod-11 implementation: validation is "the suffix equals the
    // computed check digits" (the two hand-unrolled copies had already
    // drifted on digit classification — r11 review)
    digits.substring(12) == checkDigits(digits.substring(0, 12))
  }

  /** Compute the two check digits for a 12-digit prefix (fixture helper AND
    * the validation kernel). ASCII-strict like [[isValidStr]]:
    * Character.isDigit accepted fullwidth/Arabic-Indic digits here — the
    * exact trap the validator's comment documents — and returned garbage
    * check digits for them (r11 review).
    */
  def checkDigits(prefix12: String): String = {
    require(prefix12.length == 12 &&
      prefix12.forall(c => c >= '0' && c <= '9'),
      s"checkDigits needs 12 ASCII digits, got '$prefix12'")
    val d = prefix12.map(_ - '0').toArray
    var s1 = 0
    (0 until 12).foreach(i => s1 += d(i) * W1(i))
    val c1 = { val m = s1 % 11; if (m < 2) 0 else 11 - m }
    var s2 = 0
    (0 until 12).foreach(i => s2 += d(i) * W2(i))
    s2 += c1 * W2(12)
    val c2 = { val m = s2 % 11; if (m < 2) 0 else 11 - m }
    s"$c1$c2"
  }
}
