package graft.sources

import java.util.zip.ZipFile

import scala.collection.mutable.ListBuffer

import javax.xml.parsers.DocumentBuilderFactory

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.w3c.dom.Element

/** Minimal native XLSX reader for the data-dictionary scan (reference:
  * bin/ingestion/parse-data-dictionary.py:22-24, `pd.read_excel`) — an
  * .xlsx file is a zip of XML parts, so the JDK (`java.util.zip` +
  * `javax.xml`) covers the reference's actual usage (one sheet of
  * header + string/number cells) with no third-party dependency, which
  * is what an offline/zero-egress build requires.
  *
  * Supported cell forms: shared strings (`t="s"`, what Excel itself
  * writes), inline strings (`t="inlineStr"`), formula-cached strings
  * (`t="str"`), and numbers (no `t`). Dates/styles are out of scope —
  * the dictionary is names and flags. The parse is driver-side and
  * bounded (a dictionary is a few hundred rows; the reference's pandas
  * read is driver-side too); the result enters Spark as a DataFrame.
  */
object Excel {

  private val xf = DocumentBuilderFactory.newInstance()
  xf.setNamespaceAware(false)
  // XXE hardening: a workbook is untrusted input, and a default parser
  // honors DOCTYPE — a crafted .xlsx could read driver-local files via
  // external entities or DoS via entity expansion. Spreadsheet XML
  // never legitimately carries a DOCTYPE, so reject it outright.
  xf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
  xf.setFeature(
    "http://xml.org/sax/features/external-general-entities", false)
  xf.setFeature(
    "http://xml.org/sax/features/external-parameter-entities", false)
  xf.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
  xf.setXIncludeAware(false)
  xf.setExpandEntityReferences(false)

  private def elems(parent: Element, tag: String): Seq[Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** "A1" → 0, "B7" → 1, "AA3" → 26. */
  private[graft] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1

  /** All rows of the `sheetN` worksheet as strings; missing cells in a
    * row become "". */
  def readSheet(path: String, sheet: Int = 1): Seq[Seq[String]] = {
    val zip = new ZipFile(path)
    try {
      def parse(entry: String): Option[Element] =
        Option(zip.getEntry(entry)).map { e =>
          xf.newDocumentBuilder().parse(zip.getInputStream(e))
            .getDocumentElement
        }
      val shared: IndexedSeq[String] =
        parse("xl/sharedStrings.xml").toIndexedSeq
          .flatMap(root => elems(root, "si").map(si =>
            elems(si, "t").map(_.getTextContent).mkString))
      val ws = parse(s"xl/worksheets/sheet$sheet.xml")
        .getOrElse(throw new IllegalArgumentException(
          s"no sheet$sheet in $path"))
      val out = ListBuffer.empty[Seq[String]]
      elems(ws, "row").foreach { row =>
        val cells = elems(row, "c")
        val width = cells.map(c => colIndex(c.getAttribute("r")) + 1)
          .foldLeft(0)(math.max)
        val arr = Array.fill(width)("")
        cells.foreach { c =>
          val v = c.getAttribute("t") match {
            case "s" =>
              elems(c, "v").headOption.map(_.getTextContent)
                .map(i => shared(i.toInt)).getOrElse("")
            case "inlineStr" =>
              elems(c, "is").headOption.map(is =>
                elems(is, "t").map(_.getTextContent).mkString).getOrElse("")
            case _ => // "str", numbers, booleans: the cached <v> text
              elems(c, "v").headOption.map(_.getTextContent).getOrElse("")
          }
          arr(colIndex(c.getAttribute("r"))) = v
        }
        out += arr.toSeq
      }
      out.toList
    } finally zip.close()
  }
}

/** Excel worksheet as a DataFrame of strings (first row = header when
  * `header`), completing S4's source family next to CsvSource. */
final case class ExcelSource(path: String, sheet: Int = 1,
    header: Boolean = true) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val rows = Excel.readSheet(path, sheet)
    require(rows.nonEmpty, s"empty sheet$sheet in $path")
    val names =
      if (header) rows.head.map(_.trim)
      else rows.head.indices.map(i => s"_c$i")
    val data = if (header) rows.tail else rows
    val width = names.length
    val schema = StructType(names.map(StructField(_, StringType)))
    val padded = data.map(r =>
      Row.fromSeq(r.padTo(width, "").take(width)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(padded.toList), schema)
  }
}
