package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

import graft.link.LinkOptions
import graft.pipeline.{DocKernel, DocTriples, Pipeline}
import graft.umls.UmlsTables

/** mmserver parity (/root/reference/mmserver/mmserver.pl:1): a
  * long-running annotation service holding ONE SparkSession and ONE
  * broadcast table set across requests — the reference keeps a warm
  * Prolog engine behind PrologBeans for the same reason: per-request
  * startup cost (table load) is paid once.
  *
  * The per-request path never schedules a Spark job: the document kernel
  * is a pure function over the broadcast tables, so a request is a
  * direct in-process call (exactly mmserver's execution shape; the
  * cluster is for corpus-scale batch, the server for interactive
  * single-document calls). JDK HttpServer — no extra dependencies.
  *
  * Endpoints:
  *  - `POST /annotate?id=X[&flags=-i%20-J%20dsyn][&format=F]` body =
  *    plain text → JSON array of mentions (default), or the reference
  *    output the client picked per-request, mmserver-style: `jsonf` =
  *    a JSON array of --JSONf document trees, `xmlf` = the
  *    `<MMOs>`-framed --XMLf stream, `mmo` = --machine_output term
  *    lines (unknown formats are a 400)
  *  - `POST /triples?id=X` body = plain text → JSON array of triples
  *  - `GET /health` → `{"status":"ok","requests":N}`
  *
  * Per-request `flags` accept the same reference CLI surface as
  * [[Graft.parseFlags]] (mmserver's per-request option strings).
  */
object GraftServer {

  final class Handle private[api] (server: HttpServer,
      private[api] val counter: java.util.concurrent.atomic.AtomicLong) {
    def port: Int = server.getAddress.getPort
    def requestCount: Long = counter.get()
    def stop(): Unit = {
      server.stop(0)
      server.getExecutor match {
        case es: java.util.concurrent.ExecutorService => es.shutdown()
        case _ =>
      }
    }
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def queryParams(ex: HttpExchange): Map[String, String] = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    q.split('&').filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
    ex.sendResponseBody(code, bytes)
  }

  // sendResponseBody is not a real HttpExchange method — tiny shim keeps
  // the call sites readable
  private implicit class ExOps(private val ex: HttpExchange) extends AnyVal {
    def sendResponseBody(code: Int, bytes: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
  }

  /** Start the service; `port = 0` binds an ephemeral port (tests). */
  def start(spark: SparkSession, port: Int = 0,
      baseOpts: LinkOptions = LinkOptions.default,
      umls: Option[Broadcast[UmlsTables]] = None): Handle = {
    val bc = umls.getOrElse(Pipeline.broadcastUmls(spark))
    val counter = new java.util.concurrent.atomic.AtomicLong(0L)
    val server = HttpServer.create(new InetSocketAddress(port), 0)

    def readBody(ex: HttpExchange): String = {
      val in = ex.getRequestBody
      try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    }

    def optsFor(params: Map[String, String]): LinkOptions =
      params.get("flags") match {
        case Some(f) if f.trim.nonEmpty =>
          Graft.parseFlags(f.trim.split("\\s+").toSeq)
        case _ => baseOpts
      }

    server.createContext("/annotate", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        counter.incrementAndGet()
        val params = queryParams(ex)
        val id = params.getOrElse("id", "doc")
        val opts = optsFor(params)
        val body0 = readBody(ex)
        // per-request output format, the mmserver contract (a client picks
        // --JSONf / --XMLf / --machine_output per call): `format=jsonf`
        // returns a JSON array of --JSONf document trees, `xmlf` the
        // <MMOs>-framed --XMLf stream, `mmo` the machine-output term
        // lines; default = the mention rows
        val format = params.getOrElse("format", "mentions")
        val records = graft.sources.MedlineReader.records(id, body0, opts)
        val body = format match {
          case "mentions" =>
            val ms = records.flatMap { case (url, rt) =>
              if (opts.termProcessing) DocKernel.termMentions(url, rt, bc.value, opts)
              else DocKernel.mentions(url, rt, bc.value, opts)
            }
            ms.map { m =>
              s"""{"url":${jsonStr(m.url)},"sentNo":${m.sentNo},"start":${m.start},""" +
                s""""len":${m.len},"cui":${jsonStr(m.cui)},"score":${m.score},""" +
                s""""semTypes":${m.semTypes.map(jsonStr).mkString("[", ",", "]")},""" +
                s""""sources":${m.sources.map(jsonStr).mkString("[", ",", "]")},""" +
                s""""negated":${m.negated},"text":${jsonStr(m.text)}}"""
            }.mkString("[", ",", "]")
          case "jsonf" =>
            records.map { case (url, rt) =>
              graft.output.JsonMmoOutput.document(url, rt, bc.value, opts)
            }.mkString("[", ",", "]")
          case "xmlf" =>
            records.map { case (url, rt) =>
              graft.output.XmlMmoOutput.document(url, rt, bc.value, opts)
            }.mkString("<MMOs>", "", "</MMOs>")
          case "mmo" =>
            records.flatMap { case (url, rt) =>
              graft.output.MmoOutput.document(url, rt, bc.value, opts = opts)
            }.mkString("", "\n", "\n")
          case other =>
            throw new IllegalArgumentException(s"unknown format: $other")
        }
        respond(ex, 200, body)
      } catch {
        case e: IllegalArgumentException =>
          respond(ex, 400, s"""{"error":${jsonStr(e.getMessage)}}""")
        case scala.util.control.NonFatal(e) =>
          respond(ex, 500, s"""{"error":${jsonStr(String.valueOf(e))}}""")
      }
    })

    server.createContext("/triples", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        counter.incrementAndGet()
        val params = queryParams(ex)
        val id = params.getOrElse("id", "doc")
        val opts = optsFor(params)
        val body0 = readBody(ex)
        val ts = graft.sources.MedlineReader.records(id, body0, opts)
          .flatMap { case (url, rt) =>
            DocTriples.fromDoc(url, rt, bc.value, opts)
          }
        val body = ts.map { case (s, p, o, url, sentNo) =>
          s"""{"subj_cui":${jsonStr(s)},"pred":${jsonStr(p)},""" +
            s""""obj_cui":${jsonStr(o)},"url":${jsonStr(url)},"sentNo":$sentNo}"""
        }.mkString("[", ",", "]")
        respond(ex, 200, body)
      } catch {
        case e: IllegalArgumentException =>
          respond(ex, 400, s"""{"error":${jsonStr(e.getMessage)}}""")
        case scala.util.control.NonFatal(e) =>
          respond(ex, 500, s"""{"error":${jsonStr(String.valueOf(e))}}""")
      }
    })

    server.createContext("/health", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, 200, s"""{"status":"ok","requests":${counter.get()}}""")
    })

    // a small fixed pool: the kernel is a pure function over the broadcast
    // tables so concurrent handling is safe, and a slow /annotate must not
    // serialize /health and every other client behind the dispatcher thread
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, Runtime.getRuntime.availableProcessors()),
      r => { val t = new Thread(r, "graft-server"); t.setDaemon(true); t }))
    server.start()
    new Handle(server, counter)
  }
}
