package graft.core

import scala.collection.mutable

/** Scalar utility functions from the reference's resource/util layer
  * (SURVEY §2.8): content-type parsing, output cleaning, name casing,
  * datetime format pair, and the Tika text segmentation heuristic.
  */
object TextUtils {

  /** `is_json_mimetype` (utils/data.py:7,92-93). Python's `re.match`
    * is a PREFIX match, so `application/jsonp` is json-truthy there —
    * `lookingAt` mirrors that, where a full `matches()` would not. */
  private val JsonMime = "application/(.*)json".r
  def isJsonMimetype(mime: String): Boolean =
    mime != null && JsonMime.pattern.matcher(mime).lookingAt()

  /** `parse_content_type` (resources/http/generic.py:671-687):
    * (mime_type, encoding or default). */
  private val ContentTypeRe =
    "(?<mimeType>[A-Za-z]+/[A-Za-z]+);? ?(charset=(?<encoding>[A-Za-z0-9\\-]+))?".r
  def parseContentType(contentType: String,
                       defaultEncoding: String = "utf-8"): (String, String) =
    ContentTypeRe.findPrefixMatchOf(contentType) match {
      case Some(m) =>
        (m.group("mimeType"), Option(m.group("encoding")).getOrElse(defaultEncoding))
      case None => throw new IllegalArgumentException("Could not parse content_type")
    }

  /** `clean_stdout`/`clean_stderr` (shell/generic.py:281-299): UTF-8
    * decode + NUL strip. */
  def cleanOutput(bytes: Array[Byte]): String =
    if (bytes == null) "" else new String(bytes, "UTF-8").replace("\u0000", "")

  /** `Dataset.get_name` camel→snake (datasets/db/dataset.py:95-110). */
  def camelToSnake(className: String): String = {
    val stripped0 = className.replace("Dataset", "")
    val stripped = if (stripped0.isEmpty) "Dataset" else stripped0
    val sb = new StringBuilder
    stripped.zipWithIndex.foreach { case (c, i) =>
      if (c.isUpper) { if (i != 0) sb.append('_'); sb.append(c.toLower) }
      else sb.append(c)
    }
    sb.toString
  }

  /** The reference's datetime format `%Y%m%d%H%M%S%f`
    * (datagrowth.yml:2) in both directions; parse failure → epoch
    * 1970-01-01 (utils/datetime.py:138-162). Java pattern: the
    * microsecond field `%f` maps to 6 fraction digits. */
  val DatetimeFormat = "yyyyMMddHHmmssSSSSSS"

  def parseDatetimeString(s: String): java.time.LocalDateTime = {
    try {
      val base = java.time.LocalDateTime.parse(s.substring(0, 14),
        java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
      val micros = s.substring(14).toLong
      base.plusNanos(micros * 1000)
    } catch {
      case _: Exception => java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 0)
    }
  }

  def formatDatetime(dt: java.time.LocalDateTime): String =
    dt.format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")) +
      f"${dt.getNano / 1000}%06d"

  /** The reference's last-two-in-first-out text bucket
    * (resources/shell/apache/tika.py:7-32). */
  final class TextBucket(size: Int = 2) {
    private var bucket: List[String] = Nil
    def shift(value: String): Unit = bucket = (value :: bucket).take(size)
    def pop(): Option[String] = bucket match {
      case head :: tail => bucket = tail; Some(head)
      case Nil => None
    }
    def isFull: Boolean = bucket.length >= size
    def empty(): Unit = bucket = Nil
  }

  /** `TikaResource.extract_texts` (tika.py:62-111): heuristic
    * title/paragraph/junk segmentation — >10-word lines after the title
    * are paragraphs; short lines buffer as title candidates; once the
    * bucket overflows after paragraphs, the rest is junk.
    */
  def extractTexts(title: String, text: String): (Seq[String], Seq[String], Seq[String]) = {
    if (title == null || title.isEmpty || text == null || text.isEmpty)
      return (Nil, Nil, Nil)
    val bucket = new TextBucket()
    val titles = mutable.Buffer[String]()
    val paragraphs = mutable.Buffer[String]()
    val junk = mutable.Buffer[String]()
    var passedTitle = false
    var passedParagraphs = false
    var junkOnly = false
    text.split("\n", -1).foreach { rawLine =>
      val line = rawLine.trim
      if (line.nonEmpty) {
        if (junkOnly) junk += line
        else if (title.contains(line)) {
          passedTitle = true
          titles += line
        } else {
          val isParagraph = line.split(" ").length > 10
          if (isParagraph && passedTitle) {
            passedParagraphs = true
            paragraphs += line
            bucket.pop().foreach(titles += _)
            bucket.empty()
          } else if (!isParagraph && passedTitle) {
            if (bucket.isFull && passedParagraphs) junkOnly = true
            else bucket.shift(line)
          } else junk += line
        }
      }
    }
    (titles.toSeq, paragraphs.toSeq, junk.toSeq)
  }
}
