package graft.util

/** Failure/success notification bodies, mirroring the reference's
  * HTML email assembly (code/send_notification_email.py:19-27 builds
  * the MIME body; code/ukg_open_census.py:596-676 assembles the
  * per-error HTML tables). Pure string construction — the SMTP
  * transport is behind `Mailer` and stubbed (no egress in this
  * environment; a real deployment drops in a JavaMail impl).
  */
object Notify {

  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def errorTable(errors: Seq[(String, String)]): String =
    if (errors.isEmpty) ""
    else
      errors.map { case (item, msg) =>
        s"<tr><td>${escape(item)}</td><td>${escape(msg)}</td></tr>"
      }.mkString(
        """<table border="1"><tr><th>Item</th><th>Error</th></tr>""",
        "", "</table>")

  /** Failure notification: pipeline, run id, and a per-item error
    * table (the reference's staffing-post error report shape). */
  def failureBody(pipeline: String, runId: Long,
                  errors: Seq[(String, String)]): String =
    s"""<html><body>
       |<h3>Pipeline failure: ${escape(pipeline)}</h3>
       |<p>RUN_ID: $runId</p>
       |<p>${errors.size} item(s) failed.</p>
       |${errorTable(errors)}
       |</body></html>""".stripMargin

  def successBody(pipeline: String, runId: Long, rowCount: Long): String =
    s"""<html><body>
       |<h3>Pipeline success: ${escape(pipeline)}</h3>
       |<p>RUN_ID: $runId</p>
       |<p>$rowCount row(s) processed.</p>
       |</body></html>""".stripMargin

  /** Transport seam. Production: SMTP/JavaMail. Here: collect-only. */
  trait Mailer {
    def send(to: Seq[String], subject: String, htmlBody: String): Unit
  }

  /** Test/offline mailer: records messages instead of sending. */
  final class RecordingMailer extends Mailer {
    private val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Seq[String], String, String)]
    def send(to: Seq[String], subject: String, htmlBody: String): Unit =
      buf += ((to, subject, htmlBody))
    def sent: Seq[(Seq[String], String, String)] = buf.toSeq
  }
}
