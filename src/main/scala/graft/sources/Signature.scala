package graft.sources

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Webhook signature validation (reference S2,
  * middleware/authenticate-twilio-signature.js:4-14): HMAC-SHA1 over
  * the webhook URL + raw body, base64-encoded, compared against the
  * carrier header. The reference rejects the whole HTTP request; as a
  * relational ingress operator it becomes a row filter on
  * pre-captured (url, body, signature) tuples. */
object Signature {

  def hmacSha1Base64(authToken: String): (String, String) => String = {
    (url, body) => {
      val mac = Mac.getInstance("HmacSHA1")
      mac.init(new SecretKeySpec(authToken.getBytes("UTF-8"), "HmacSHA1"))
      java.util.Base64.getEncoder.encodeToString(
        mac.doFinal((url + body).getBytes("UTF-8")))
    }
  }

  /** Column form: expected signature for (url, body) under the token. */
  def expectedSignature(authToken: String)(url: Column, body: Column): Column = {
    val f = hmacSha1Base64(authToken)
    udf(f).apply(url, body)
  }

  /** Keep only rows whose signature header matches (the engine-side
    * equivalent of the reference's authenticate middleware). */
  def validated(df: DataFrame, authToken: String,
      urlCol: String = "url", bodyCol: String = "body",
      sigCol: String = "signature"): DataFrame =
    df.filter(expectedSignature(authToken)(col(urlCol), col(bodyCol)) === col(sigCol))
}
