package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.service.{ErrorMapping, ErrorResponse, HttpException, HttpExceptions => H}
import graft.sinks.{ForeignKeyDbException, UniqueKeyDbException}

/** Error-translation parity with the reference middleware: exact
  * status codes and message templates per exception class, the
  * `|| 500` / `|| 'Something went wrong'` fallbacks, and the typed-DB
  * bridge onto the 400-level forms.
  */
class ErrorMappingSpec extends AnyFunSuite {

  private def r(t: Throwable): ErrorResponse = ErrorMapping.toResponse(t)

  test("each exception class maps to its reference status and message") {
    assert(r(new H.DuplicateException("n1")) ==
      ErrorResponse(400, "Input with value 'n1' already exists."))
    assert(r(new H.UnAuthenticated) ==
      ErrorResponse(401,
        "User not authenticated/authorized to perform this action."))
    assert(r(new H.ForeignKeyException("fk")) ==
      ErrorResponse(400,
        "No reference found for the constraint 'fk' in the system."))
    assert(r(new H.FileTypeException) ==
      ErrorResponse(400, "Invalid file type."))
    assert(r(new H.OverlapException("rec")) ==
      ErrorResponse(400,
        "Given record overlaps with tdeirecord rec in the system."))
    assert(r(new H.UserNotFoundException("u")) ==
      ErrorResponse(404, "User not found for the given username 'u'."))
    assert(r(new H.InputException("bad input")) ==
      ErrorResponse(400, "bad input"))
    assert(r(new H.JobIdNotFoundException("42")) ==
      ErrorResponse(404, "JobId with ID 42 not found"))
    assert(r(new H.ServiceNotFoundException("svc")) ==
      ErrorResponse(404, "Service ID svc is not found or inactive"))
    assert(r(new H.JobIncompleteException("42")) ==
      ErrorResponse(404, "JobId with ID 42 not completed"))
  }

  test("middleware fallbacks: falsy status and message, unknown errors") {
    // JS `||`: status 0 and empty message are absent
    assert(r(new HttpException(0, "m")) == ErrorResponse(500, "m"))
    assert(r(new HttpException(418, "")) ==
      ErrorResponse(418, "Something went wrong"))
    // a generic error keeps ITS message (the reference reads
    // error.message before falling back) but gets status 500
    assert(r(new RuntimeException("boom")) == ErrorResponse(500, "boom"))
    assert(r(new RuntimeException(null: String)) ==
      ErrorResponse(500, "Something went wrong"))
  }

  test("typed DB exceptions bridge to the reference 400 forms") {
    assert(r(new UniqueKeyDbException("Duplicate", null)) ==
      ErrorResponse(400, "Input with value 'Duplicate' already exists."))
    assert(r(new ForeignKeyDbException("fk_node_dataset", null)) ==
      ErrorResponse(400,
        "No reference found for the constraint 'fk_node_dataset' in the system."))
  }

  test("unhandled-exception backstop logs with the reference prefix") {
    @volatile var logged: String = null
    val prev = Thread.getDefaultUncaughtExceptionHandler
    try {
      ErrorMapping.registerUnhandledHandler(m => logged = m)
      val t = new Thread(() => throw new IllegalStateException("die"))
      t.start(); t.join()
      assert(logged == "GOT AN UNCAUGHT EXCEPTION => die")
    } finally Thread.setDefaultUncaughtExceptionHandler(prev)
  }
}
