"""Hub entry points (parity: reference ``hubconf.py:15-36``).

Usage::

    import celldetection_tpu as cdt
    model = cdt.fetch_model('ginoro_CpnResNeXt101UNet-fbe875f1b3e5ce2c')

or via this hubconf::

    from hubconf import ginoro
    model = ginoro()
"""
dependencies = ['jax', 'flax', 'numpy']  # .pt ingestion is torch-free (util/pt_pickle.py)


def ginoro(**kwargs):
    """The hosted ginoro CpnResNeXt101UNet model (multi-dataset trained).

    Requires network egress (or a locally cached/provided checkpoint path via
    ``cdt.load_model``). The torch ``.pt`` checkpoint is ingested through the
    torch-free zipfile+pickle reader and the state-dict transport layer.
    """
    from celldetection_tpu.util.serialization import fetch_model
    return fetch_model('ginoro_CpnResNeXt101UNet-fbe875f1b3e5ce2c', **kwargs)
