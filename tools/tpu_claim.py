"""TPU claim helper for this container's axon tunnel.

The sitecustomize hook claims the (single) TPU at interpreter start; when
another process holds or recently held the lease, registration fails and the
'axon' backend is absent. This helper retries the registration in-process
until the lease frees — needed because leases linger for minutes after the
previous holder exits (or longer after a SIGKILL).
"""
import os
import time


def claim_tpu(max_wait: int = 900, poll: int = 25) -> bool:
    import jax

    t0 = time.time()
    last = None
    while time.time() - t0 < max_wait:
        try:
            d = jax.devices()
            print("TPU claimed:", d, flush=True)
            return True
        except RuntimeError as e:
            last = e
        try:
            from axon.register import register

            # session_id=None: axon's GLOBAL_CLIENT is a OnceLock whose
            # options are fixed by the FIRST register() (usually the
            # sitecustomize boot claim). A re-entry with a fresh uuid fails
            # "already registered; cannot change session_id"; a re-entry
            # None defers to the registered session and lets the lease
            # retry proceed (axon.register._record_or_check_once docs).
            register(
                None,
                os.environ.get("PALLAS_AXON_TPU_GEN", "v5e") + ":1x1x1",
                so_path="/opt/axon/libaxon_pjrt.so",
                session_id=None,
                remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1",
            )
        except Exception as e:  # noqa: BLE001 - retried
            last = e
        print(f"waiting for TPU lease... ({type(last).__name__})", flush=True)
        time.sleep(poll)
    raise RuntimeError(f"TPU not claimable after {max_wait}s: {last}")


if __name__ == "__main__":
    claim_tpu()
