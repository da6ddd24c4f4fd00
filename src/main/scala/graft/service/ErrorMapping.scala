package graft.service

import graft.sinks.{ForeignKeyDbException, UniqueKeyDbException}

/** HTTP exception hierarchy + error-translation parity with the
  * reference control plane: every class mirrors a reference exception
  * with the SAME status code and message template
  * (`src/exceptions/http/http-base-exception.ts:1-9`,
  * `src/exceptions/http/http-exceptions.ts:3-63`), and
  * [[ErrorMapping.toResponse]] is the terminal error-handler
  * middleware (`src/middleware/error-handler-middleware.ts:13-22`):
  * typed exceptions keep their status/message, everything else
  * collapses to `500 / "Something went wrong"`.
  */
class HttpException(val status: Int, message: String)
    extends RuntimeException(message)

object HttpExceptions {
  /** `http-exceptions.ts:3-7` */
  final class DuplicateException(name: String) extends HttpException(400,
    s"Input with value '$name' already exists.")

  /** `http-exceptions.ts:9-13` */
  final class UnAuthenticated extends HttpException(401,
    "User not authenticated/authorized to perform this action.")

  /** `http-exceptions.ts:15-19` */
  final class ForeignKeyException(name: String) extends HttpException(400,
    s"No reference found for the constraint '$name' in the system.")

  /** `http-exceptions.ts:21-25` */
  final class FileTypeException extends HttpException(400,
    "Invalid file type.")

  /** `http-exceptions.ts:27-31` */
  final class OverlapException(name: String) extends HttpException(400,
    s"Given record overlaps with tdeirecord $name in the system.")

  /** `http-exceptions.ts:33-37` */
  final class UserNotFoundException(name: String) extends HttpException(404,
    s"User not found for the given username '$name'.")

  /** `http-exceptions.ts:39-43` */
  final class InputException(message: String) extends HttpException(400, message)

  /** `http-exceptions.ts:45-49` */
  final class JobIdNotFoundException(jobId: String) extends HttpException(404,
    s"JobId with ID $jobId not found")

  /** `http-exceptions.ts:51-55` */
  final class ServiceNotFoundException(serviceId: String)
      extends HttpException(404,
    s"Service ID $serviceId is not found or inactive")

  /** `http-exceptions.ts:58-62` */
  final class JobIncompleteException(jobId: String) extends HttpException(404,
    s"JobId with ID $jobId not completed")
}

/** The terminal response a failed request/job maps to. */
final case class ErrorResponse(status: Int, message: String)

object ErrorMapping {

  /** Fallbacks of `error-handler-middleware.ts:15-16`: JS `||` treats
    * status 0 and an empty message as absent.
    */
  private val DefaultStatus = 500
  private val DefaultMessage = "Something went wrong"

  /** Translate any failure into its response — the error-handler
    * middleware plus the typed-DB bridge: the warehouse's SQLSTATE
    * exceptions ([[graft.sinks.UniqueKeyDbException]] 23505,
    * [[graft.sinks.ForeignKeyDbException]] 23503) surface as the
    * 400-level HTTP forms the reference defines for the same
    * conditions, instead of collapsing to 500.
    */
  def toResponse(t: Throwable): ErrorResponse = t match {
    case h: HttpException =>
      val status = if (h.status == 0) DefaultStatus else h.status
      val msg = Option(h.getMessage).filter(_.nonEmpty)
        .getOrElse(DefaultMessage)
      ErrorResponse(status, msg)
    case u: UniqueKeyDbException =>
      toResponse(new HttpExceptions.DuplicateException(u.getMessage))
    case f: ForeignKeyDbException =>
      toResponse(new HttpExceptions.ForeignKeyException(f.getMessage))
    case other =>
      ErrorResponse(DefaultStatus,
        Option(other.getMessage).filter(_.nonEmpty).getOrElse(DefaultMessage))
  }

  /** Process-level backstop parity
    * (`src/middleware/unhandled-exception-rejection-handler.ts:7-24`):
    * install a default uncaught-exception handler that logs with the
    * reference's prefix instead of killing the worker silently. The
    * JVM twin of `process.on('uncaughtException'|'unhandledRejection')`.
    */
  def registerUnhandledHandler(log: String => Unit): Unit =
    Thread.setDefaultUncaughtExceptionHandler(
      new Thread.UncaughtExceptionHandler {
        def uncaughtException(t: Thread, e: Throwable): Unit =
          log(s"GOT AN UNCAUGHT EXCEPTION => ${e.getMessage}")
      })
}
