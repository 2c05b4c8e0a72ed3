"""Minimal console entry point for the ghm_tpu package."""


def main():
    """Print a short package smoke-test message with backend info."""
    import ghm_tpu

    print(f"ghm_tpu {ghm_tpu.__version__} — TPU-native Multimodal-GHM framework")
    try:
        import jax

        print(f"jax {jax.__version__}, devices: {jax.devices()}")
    except Exception as exc:  # pragma: no cover
        print(f"jax unavailable: {exc}")


if __name__ == "__main__":
    main()
