"""Sources & sinks: pages reader, bucketed segment storage, checkpoint
manifests for resumable builds."""
