package graft.functions

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** JVM crypto kernels invoked from both interpreted eval and generated
  * code (the codegen template calls the static forwarders of this
  * object, so the expression stays inside WholeStageCodegen).
  *
  * Mirrors the reference pipeline's per-message HMAC-SHA256 integrity
  * check (salrashid123/dataflow_pubsub_message_encryption — the Beam
  * DoFn recomputes the signature over the payload and compares it to
  * the message attribute; semantics per SURVEY.md §2.A A4).
  */
object CryptoCodecs {

  /** One Mac instance per thread: Mac.getInstance + init per row would
    * dominate the per-row cost at 100 TB; cloning state per executor
    * thread keeps the hot path allocation-free except the result.
    */
  private val macs: ThreadLocal[Mac] = new ThreadLocal[Mac]

  def hmacSha256(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    var mac = macs.get()
    if (mac == null) {
      mac = Mac.getInstance("HmacSHA256")
      macs.set(mac)
    }
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }
}
