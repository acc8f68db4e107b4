SELECT evm_hex_decode_int(
           get_json_object(
               ethereum_rpc('eth_blockNumber', array(),
                            '{{.RPC_ENDPOINT}}#fail-on-error=true&fail-on-null=true'),
               '$.value'),
           'UInt64') AS tip
