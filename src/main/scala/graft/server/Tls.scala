package graft.server

import java.security.{KeyFactory, KeyStore, PrivateKey}
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Base64
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** TLS bootstrap from PEM files, mirroring the reference's CLI surface
  * (reference: qcache/app.py:323-341 `ssl_options`): `--cert-file` is one
  * PEM bundle holding the private key and the certificate chain;
  * `--ca-file` adds client-certificate verification against that CA.
  *
  * Private keys must be PKCS#8 ("BEGIN PRIVATE KEY", what `openssl
  * genpkey`/`req -nodes` emit); RSA and EC are supported.
  */
object Tls {

  private val PemBlock = "(?s)-----BEGIN ([A-Z0-9 ]+)-----(.*?)-----END \\1-----".r

  private def pemBlocks(pem: String): Seq[(String, Array[Byte])] =
    PemBlock.findAllMatchIn(pem).map { m =>
      (m.group(1), Base64.getMimeDecoder.decode(m.group(2).trim))
    }.toSeq

  def parseCertificates(pem: String): Seq[X509Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    pemBlocks(pem).collect { case ("CERTIFICATE", der) =>
      cf.generateCertificate(new java.io.ByteArrayInputStream(der))
        .asInstanceOf[X509Certificate]
    }
  }

  def parsePrivateKey(pem: String): PrivateKey = {
    val der = pemBlocks(pem).collectFirst { case ("PRIVATE KEY", d) => d }
      .getOrElse(throw new IllegalArgumentException(
        "no PKCS#8 'BEGIN PRIVATE KEY' block found in cert file " +
          "(PKCS#1 'BEGIN RSA PRIVATE KEY' is not supported — convert with " +
          "`openssl pkcs8 -topk8 -nocrypt`)"))
    val spec = new PKCS8EncodedKeySpec(der)
    Seq("RSA", "EC", "DSA").view.flatMap { alg =>
      try Some(KeyFactory.getInstance(alg).generatePrivate(spec))
      catch { case _: java.security.spec.InvalidKeySpecException => None }
    }.headOption.getOrElse(
      throw new IllegalArgumentException("unsupported private key algorithm"))
  }

  /** SSLContext from a key+cert PEM bundle; with `caFile`, the returned
    * context also verifies client certificates against that CA (callers
    * should then set needClientAuth). */
  def contextFromPem(certFile: String, caFile: Option[String]): SSLContext = {
    val bundle = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(certFile)),
      java.nio.charset.StandardCharsets.UTF_8)
    val certs = parseCertificates(bundle)
    require(certs.nonEmpty, s"no certificate found in $certFile")
    val key = parsePrivateKey(bundle)

    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("server", key, Array.emptyCharArray, certs.toArray)
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)

    val tms = caFile.map { ca =>
      val caCerts = parseCertificates(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(ca)),
        java.nio.charset.StandardCharsets.UTF_8))
      require(caCerts.nonEmpty, s"no certificate found in $ca")
      val ts = KeyStore.getInstance("PKCS12")
      ts.load(null, null)
      caCerts.zipWithIndex.foreach { case (c, i) => ts.setCertificateEntry(s"ca$i", c) }
      val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ts)
      tmf.getTrustManagers
    }.orNull

    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tms, null)
    ctx
  }
}
