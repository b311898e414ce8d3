package graft.sources.pg

import java.io.FileInputStream
import java.nio.file.Files
import java.security.KeyStore

import javax.net.ssl.{KeyManagerFactory, SSLContext}

/** Test-only TLS material: a self-signed RSA keypair generated once per
  * JVM with the JDK's `keytool`, loaded into a server-side SSLContext for
  * the fake server's SSLRequest path.
  */
object TestTls {

  lazy val serverContext: SSLContext = {
    val dir = Files.createTempDirectory("graft_tls")
    val ksPath = dir.resolve("ks.p12")
    val pass = "graft-test-pass"
    val keytool = sys.props.get("java.home")
      .map(h => java.nio.file.Paths.get(h, "bin", "keytool").toString)
      .getOrElse("keytool")
    val cmd = Array(keytool, "-genkeypair", "-keyalg", "RSA", "-keysize", "2048",
      "-storetype", "PKCS12", "-keystore", ksPath.toString,
      "-storepass", pass, "-keypass", pass,
      "-alias", "fakepg", "-dname", "CN=localhost", "-validity", "2")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
    require(p.waitFor() == 0, s"keytool failed: $log")

    val ks = KeyStore.getInstance("PKCS12")
    val fis = new FileInputStream(ksPath.toFile)
    try ks.load(fis, pass.toCharArray) finally fis.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, pass.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }
}
