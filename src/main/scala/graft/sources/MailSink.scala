package graft.sources

/** Report delivery sink — the engine-boundary form of the reference's
  * SMTP email step (`/root/reference/lib/maillogsentinel/report.py:
  * 420-453`): a rendered report body + optional CSV attachment handed to
  * an injectable transport. The reference talks to SMTP localhost; tests
  * (and this zero-egress container) use a file/memory transport. Always
  * driver-side — delivery happens after collect(), never on executors.
  */
object MailSink {

  final case class Message(
      from: String, to: String, subject: String, body: String,
      attachmentName: Option[String] = None,
      attachment: Option[Array[Byte]] = None)

  /** Transport seam (the reference mocks smtplib the same way,
    * test_report.py). */
  trait Transport { def send(msg: Message): Unit }

  /** File transport: one file per message, atomic rename on completion
    * (same temp-then-replace discipline as the reference's DB refresh,
    * ipinfo.py:87-99). */
  final class FileTransport(dir: java.nio.file.Path) extends Transport {
    override def send(msg: Message): Unit = {
      java.nio.file.Files.createDirectories(dir)
      val name = s"${System.currentTimeMillis()}_${msg.subject.hashCode.abs}"
      val tmp = dir.resolve(s".$name.tmp")
      val dst = dir.resolve(s"$name.eml")
      val text = new StringBuilder()
        .append(s"From: ${msg.from}\n")
        .append(s"To: ${msg.to}\n")
        .append(s"Subject: ${msg.subject}\n\n")
        .append(msg.body)
      msg.attachmentName.foreach(n =>
        text.append(s"\n--- attachment: $n (${msg.attachment.fold(0)(_.length)} bytes) ---\n"))
      java.nio.file.Files.write(tmp,
        text.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** In-memory transport for specs. */
  final class MemoryTransport extends Transport {
    val sent = scala.collection.mutable.ArrayBuffer.empty[Message]
    override def send(msg: Message): Unit = sent += msg
  }

  /** Guard rails matching the reference (report.py:250-261): missing
    * recipient ⇒ refuse to send. */
  def deliver(transport: Transport, msg: Message): Either[String, Unit] =
    if (msg.to.trim.isEmpty) Left("no recipient configured")
    else { transport.send(msg); Right(()) }
}
