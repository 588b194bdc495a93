package graft.drain

import java.util.regex.{Pattern, PatternSyntaxException}
import scala.collection.concurrent.TrieMap

/** Parameter-list extraction, a faithful port of the reference's
  * `Drain/Drain.py::get_parameter_list` ≈L402–415 (SURVEY §2.6 F6; §0.1 citation
  * caveat). The quirks are load-bearing — golden outputs encode them:
  *
  *  1. `re.sub(r"<.{1,5}>", "<*>", template)` ALSO rewrites short literal `<...>`
  *     runs (e.g. a literal `<init>` token becomes a parameter slot).
  *  2. every non-alphanumeric char is backslash-escaped, then `\ ` runs become `\s+`.
  *  3. `<*>` slots become non-greedy `(.*?)` groups, anchored `^...$`.
  *
  * The generated pattern is cached per distinct template (templates are few, lines are
  * many), making the per-line cost one regex match — safe inside a UDF.
  */
object ParamExtractor extends Serializable {

  private val cache = new TrieMap[String, Option[Pattern]]()

  /** Build the parameter regex for a template; None when the template has no slots
    * (reference returns `[]`) or the escaped pattern is not valid Java regex
    * (only possible with non-ASCII letters, which Python escapes but Java rejects).
    */
  def templatePattern(template: String): Option[Pattern] = cache.getOrElseUpdate(template, {
    var tr = template.replaceAll("<.{1,5}>", "<*>")
    if (!tr.contains("<*>")) None
    else {
      tr = tr.replaceAll("([^A-Za-z0-9])", "\\\\$1")
      tr = tr.replaceAll("\\\\ +", "\\\\s+")
      val pat = "^" + tr.replace("\\<\\*\\>", "(.*?)") + "$"
      try Some(Pattern.compile(pat))
      catch { case _: PatternSyntaxException => None }
    }
  })

  /** Extract the parameter values of `content` under `template`; empty when the
    * template has no slots or the content does not match (reference behavior).
    */
  def extract(template: String, content: String): Array[String] =
    templatePattern(template) match {
      case None => Array.empty
      case Some(p) =>
        val m = p.matcher(content)
        if (!m.find()) Array.empty
        else {
          val out = new Array[String](m.groupCount())
          var i = 0
          while (i < out.length) { out(i) = m.group(i + 1); i += 1 }
          out
        }
    }
}
