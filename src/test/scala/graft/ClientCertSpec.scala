package graft

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpResponse.BodyHandlers
import java.security.KeyStore
import java.security.cert.X509Certificate
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManager, X509TrustManager}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.server.{GraftServer, Tls}

/** Client-certificate verification (reference: test/test_api.py:644-750 +
  * app.py ssl_options with cafile → CERT_REQUIRED): the server is built
  * exactly the way the CLI builds it — Tls.contextFromPem on the PEM
  * fixtures with a CA file — and must reject handshakes without a client
  * cert or with one not signed by the CA, while accepting the CA-signed
  * client. Also covers the PEM parsing helpers themselves. */
class ClientCertSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  var server: GraftServer = _

  private def res(name: String): String =
    new java.io.File(getClass.getResource(s"/tls/$name").toURI).getAbsolutePath

  override def beforeAll(): Unit = {
    val ctx = Tls.contextFromPem(res("server.pem"), Some(res("ca.pem")))
    server = new GraftServer(spark, 0, ssl = Some(ctx), needClientAuth = true)
    server.start()
  }
  override def afterAll(): Unit = if (server != null) server.stop()

  private val trustAll: Array[TrustManager] = Array(new X509TrustManager {
    override def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
    override def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
    override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
  })

  private def clientWith(p12: Option[String]): HttpClient = {
    val kms = p12.map { path =>
      val ks = KeyStore.getInstance("PKCS12")
      val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
      try ks.load(in, "changeit".toCharArray) finally in.close()
      val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, "changeit".toCharArray)
      kmf.getKeyManagers
    }.orNull
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kms, trustAll, new java.security.SecureRandom())
    HttpClient.newBuilder().sslContext(ctx).build()
  }

  private def status(client: HttpClient): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(
      s"https://localhost:${server.boundPort}/qcache/status")).GET().build(),
      BodyHandlers.ofString())

  test("handshake without a client certificate is rejected") {
    assertThrows[IOException](status(clientWith(None)))
  }

  test("client certificate not signed by the CA is rejected") {
    assertThrows[IOException](status(clientWith(Some(res("other.p12")))))
  }

  test("CA-signed client certificate is accepted end to end") {
    val r = status(clientWith(Some(res("client.p12"))))
    assert(r.statusCode() == 200 && r.body() == "OK")
  }

  test("PEM helpers parse the fixture bundle") {
    val pem = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(res("server.pem"))))
    assert(Tls.parseCertificates(pem).head
      .getSubjectX500Principal.getName.contains("CN=localhost"))
    assert(Tls.parsePrivateKey(pem).getAlgorithm == "RSA")
  }
}
